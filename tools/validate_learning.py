#!/usr/bin/env python3
"""End-to-end learning validation: overfit a tiny detector to mAP50 = 1.0.

Generates a 16-image synthetic dataset (solid boxes of 2 classes), trains
`multigriddet_tiny` for 600 epochs, then evaluates with the fused
forward+decode+NMS path and the custom mAP.  A passing run (mAP50 -> 1.0)
proves the encode -> loss -> optimizer -> decode -> NMS -> matching chain
is self-consistent — the strongest cheap check of the whole framework.

Last verified on TPU v5e: final loss 0.31, OVERFIT mAP50 = 1.0 (~9 min).

Usage:  python tools/validate_learning.py [--epochs 600]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def make_dataset(root):
    from PIL import Image, ImageDraw
    rng = np.random.RandomState(0)
    lines = []
    for i in range(16):
        img = Image.new('RGB', (128, 128), (rng.randint(0, 60),) * 3)
        d = ImageDraw.Draw(img)
        x1, y1 = rng.randint(5, 60), rng.randint(5, 60)
        w, h = rng.randint(30, 60), rng.randint(30, 60)
        cls = i % 2
        color = (230, 30, 30) if cls == 0 else (30, 230, 30)
        d.rectangle([x1, y1, x1 + w, y1 + h], fill=color)
        p = os.path.join(root, f'img_{i}.jpg')
        img.save(p, quality=95)
        lines.append(f'{p} {x1},{y1},{x1 + w},{y1 + h},{cls}')
    ann = os.path.join(root, 'ann.txt')
    with open(ann, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    return ann


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--epochs', type=int, default=600)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
    from multigriddet_tpu.models import create_model
    from multigriddet_tpu.losses import LossConfig
    from multigriddet_tpu.data import (MultiGridDataGenerator,
                                       load_annotation_lines)
    from multigriddet_tpu.data.annotations import (letterbox_image,
                                                   parse_annotation_line)
    from multigriddet_tpu.training import (create_train_state,
                                           make_infer_step, make_train_step)
    from multigriddet_tpu.evaluation import calculate_map
    from PIL import Image

    ANCHORS = [np.array([[48, 48]], np.float32),
               np.array([[24, 24]], np.float32),
               np.array([[12, 12]], np.float32)]
    HW, C = (128, 128), 2
    root = tempfile.mkdtemp(prefix='mgd_validate_')
    ann = make_dataset(root)
    lines = load_annotation_lines(ann, shuffle=False)
    gen = MultiGridDataGenerator(lines, ANCHORS, C, HW, batch_size=8,
                                 max_boxes=4, augment={'enabled': False},
                                 train=True, seed=0)
    model = create_model('multigriddet_tiny', num_anchors=(1, 1, 1),
                         num_classes=C)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False))()
    tx = optax.adam(2e-3)
    state = create_train_state(variables['params'],
                               variables['batch_stats'], tx)
    step = make_train_step(
        model, tx, ANCHORS, C, HW,
        LossConfig(loss_option=2, coord_scale=5.0, no_object_scale=0.5),
        donate=False)
    t0 = time.time()
    for epoch in range(args.epochs):
        for images, y_true, _ in gen:
            state, m = step(state, images, y_true)
        if epoch % 100 == 0:
            print(f'epoch {epoch} loss {float(m["loss"]):.4f} '
                  f'({time.time() - t0:.0f}s)')
    print('final loss', float(m['loss']))

    infer = make_infer_step(model, ANCHORS, HW, confidence=0.15,
                            max_boxes=10, pre_nms_top_k=64)
    trained = {'params': state.params, 'batch_stats': state.batch_stats}
    preds, gts = {}, {}
    for i, line in enumerate(lines):
        path, b = parse_annotation_line(line)
        arr, _, _, _ = letterbox_image(Image.open(path).convert('RGB'), HW)
        bx, cl, sc, valid = infer(trained, jnp.asarray(arr)[None])
        k = np.asarray(valid[0])
        preds[i] = {'boxes': np.asarray(bx[0])[k],
                    'classes': np.asarray(cl[0])[k].astype(np.int32),
                    'scores': np.asarray(sc[0])[k]}
        gts[i] = {'boxes': np.stack([b[:, 0], b[:, 1], b[:, 2] - b[:, 0],
                                     b[:, 3] - b[:, 1]], -1),
                  'classes': b[:, 4].astype(np.int32)}
    r = calculate_map(preds, gts, C, iou_thresholds=[0.5])
    print('OVERFIT mAP50:', r['mAP50'])
    assert r['mAP50'] > 0.95, 'learning validation FAILED'
    print('learning validation PASSED')


if __name__ == '__main__':
    main()
