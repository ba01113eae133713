#!/usr/bin/env python3
"""Model-zoo validation: every non-flagship preset learns on chip.

Trains each preset on the same synthetic 4-class shapes task as
tools/validate_flagship.py (200 images, full device pipeline with
mosaic + flips + zoom) for a shorter budget and evaluates mAP through
the fused forward+decode+NMS path — evidence that every model family
(CSP, PANet, ResNet, mobile) trains end to end, not just builds.

Usage:
  python tools/validate_presets.py                  # all presets
  python tools/validate_presets.py csp panet        # a subset
  python tools/validate_presets.py multi_anchor     # csp with
      training.multi_anchor_assign=True through the whole encode ->
      loss -> decode -> NMS -> mAP chain (VERDICT r3 #8) — passes when
      mAP50 lands within noise of the single-assign csp run

Last verified on TPU v5e (60 epochs each):
  csp (29.0M) mAP50=0.937, panet (39.9M) mAP50=0.938,
  resnet (32.5M) mAP50=0.956, mobile (2.5M) mAP50=0.916.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import optax
from PIL import Image, ImageDraw

from multigriddet_tpu.data import MultiGridDataGenerator, load_annotation_lines
from multigriddet_tpu.data.annotations import (letterbox_image,
                                               parse_annotation_line)
from multigriddet_tpu.evaluation import calculate_map
from multigriddet_tpu.losses import LossConfig
from multigriddet_tpu.models import create_model
from multigriddet_tpu.training import (create_train_state, make_infer_step,
                                       make_train_step)

PRESETS = {
    'csp': 'multigriddet_csp_darknet',
    'panet': 'multigriddet_darknet_panet',
    'resnet': 'multigriddet_resnet',
    'mobile': 'multigriddet_mobile',
    # encoder variant, not a model: csp trained on multi-anchor-assigned
    # targets (every qualifying layer gets the box, encoding.py:91-100)
    'multi_anchor': 'multigriddet_csp_darknet',
}
HW, C, B, EPOCHS = (256, 256), 4, 16, 60
ANCHORS = [np.array([[96, 96]], np.float32),
           np.array([[56, 56]], np.float32),
           np.array([[28, 28]], np.float32)]
SHAPES = ['rect', 'ellipse', 'tri', 'cross']
COLORS = [(230, 40, 40), (40, 230, 40), (60, 60, 230), (230, 230, 40)]


def make_dataset(root):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(200):
        img = Image.new('RGB', (256, 256), tuple(rng.randint(0, 50, 3)))
        d = ImageDraw.Draw(img)
        toks = []
        for _ in range(rng.randint(1, 4)):
            cls = rng.randint(0, 4)
            w, h = rng.randint(40, 110), rng.randint(40, 110)
            x1, y1 = rng.randint(0, 256 - w), rng.randint(0, 256 - h)
            col = COLORS[cls]
            if SHAPES[cls] == 'rect':
                d.rectangle([x1, y1, x1 + w, y1 + h], fill=col)
            elif SHAPES[cls] == 'ellipse':
                d.ellipse([x1, y1, x1 + w, y1 + h], fill=col)
            elif SHAPES[cls] == 'tri':
                d.polygon([(x1 + w // 2, y1), (x1, y1 + h),
                           (x1 + w, y1 + h)], fill=col)
            else:
                d.rectangle([x1 + w // 3, y1, x1 + 2 * w // 3, y1 + h],
                            fill=col)
                d.rectangle([x1, y1 + h // 3, x1 + w, y1 + 2 * h // 3],
                            fill=col)
            toks.append(f'{x1},{y1},{x1+w},{y1+h},{cls}')
        p = f'{root}/i{i}.jpg'
        img.save(p, quality=95)
        lines.append(p + ' ' + ' '.join(toks))
    ann = f'{root}/ann.txt'
    open(ann, 'w').write('\n'.join(lines) + '\n')
    return ann


def run_preset(preset_name, ann, multi_anchor=False):
    gen = MultiGridDataGenerator(
        load_annotation_lines(ann), ANCHORS, C, HW, batch_size=B,
        max_boxes=8,
        augment={'enabled': True, 'mosaic_prob': 0.2, 'mixup_prob': 0.0,
                 'hflip_prob': 0.5, 'scale_range': (0.85, 1.15),
                 'rotate_prob': 0.0, 'grayscale_prob': 0.0},
        train=True, seed=0, multi_anchor_assign=multi_anchor)
    model = create_model(preset_name, num_anchors=(1, 1, 1), num_classes=C,
                         dtype=jnp.bfloat16, bn_momentum=0.9)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, *HW, 3)), train=False))()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(v['params']))
    spe = len(gen)
    sched = optax.warmup_cosine_decay_schedule(
        1e-5, 1e-3, 3 * spe, EPOCHS * spe, 1e-6)
    tx = optax.adam(sched)
    state = create_train_state(v['params'], v['batch_stats'], tx)
    step = make_train_step(
        model, tx, ANCHORS, C, HW,
        LossConfig(loss_option=2, coord_scale=5.0, no_object_scale=0.5,
                   label_smoothing=0.01),
        donate=False)
    t0 = time.time()
    for epoch in range(EPOCHS):
        for images, y_true, _ in gen:
            state, m = step(state, images, y_true)
        if epoch % 20 == 0:
            print(f'  {preset_name} epoch {epoch} '
                  f'loss {float(m["loss"]):.3f} ({time.time()-t0:.0f}s)',
                  flush=True)
    gen.close()
    loss = float(m['loss'])

    infer = make_infer_step(model, ANCHORS, HW, confidence=0.25,
                            max_boxes=12, pre_nms_top_k=128)
    trained = {'params': state.params, 'batch_stats': state.batch_stats}
    preds, gts = {}, {}
    lines = load_annotation_lines(ann, shuffle=False)
    for start in range(0, len(lines), B):
        chunk = lines[start:start + B]
        arrs, metas = [], []
        for line in chunk:
            path, bx = parse_annotation_line(line)
            arr, _, _, _ = letterbox_image(Image.open(path).convert('RGB'),
                                           HW)
            arrs.append(arr)
            metas.append(bx)
        bxs, cls, scs, valid = infer(trained, jnp.asarray(np.stack(arrs)))
        bxs, cls, scs, valid = map(np.asarray, (bxs, cls, scs, valid))
        for j, bx in enumerate(metas):
            k = valid[j]
            preds[start + j] = {'boxes': bxs[j][k],
                                'classes': cls[j][k].astype(np.int32),
                                'scores': scs[j][k]}
            gts[start + j] = {
                'boxes': np.stack([bx[:, 0], bx[:, 1], bx[:, 2] - bx[:, 0],
                                   bx[:, 3] - bx[:, 1]], -1),
                'classes': bx[:, 4].astype(np.int32)}
    r = calculate_map(preds, gts, C)
    print(f'{preset_name}: {n_params/1e6:.1f}M params, final loss '
          f'{loss:.3f}, mAP50={r["mAP50"]:.3f}, mAP={r["mAP"]:.3f} '
          f'({time.time()-t0:.0f}s)', flush=True)
    return r['mAP50']


def main():
    # multi_anchor is an explicit opt-in (it re-trains csp with a
    # different encoder, doubling the csp budget in a default run)
    default = [k for k in PRESETS if k != 'multi_anchor']
    keys = sys.argv[1:] or default
    ann = make_dataset('/tmp/mgd_preset_validation')
    results = {}
    for key in keys:
        results[key] = run_preset(PRESETS[key], ann,
                                  multi_anchor=(key == 'multi_anchor'))
    print('\nSummary:')
    for key, m in results.items():
        print(f'  {key} ({PRESETS[key]}): mAP50={m:.3f}')
    assert all(m > 0.7 for m in results.values()), results


if __name__ == '__main__':
    main()
