#!/usr/bin/env python3
"""Quantify the pre-NMS top-K candidate-pool truncation (VERDICT r2 #5).

The reference's handle_predictions never truncates its candidate pool
(/root/reference/multigriddet/postprocess/multigrid_decode.py:237-320);
our fixed-shape NMS pre-selects ``pre_nms_top_k`` candidates after the
confidence filter (default 1024, inference/engine.py:48).

Key structural fact exploited here: greedy NMS suppression only flows
DOWNWARD in score (a candidate can only be suppressed by a higher-scored
one, for standard/DIoU and the soft/cluster variants' decays alike), so
truncating the pool to the top K by score NEVER changes which of those K
survive — it can only LOSE survivors ranked below K.  Hence ONE
full-pool NMS per image fully determines the loss at every (K,
confidence): lost(K, conf) = full-pool survivors with score >= conf and
score-rank >= K.  (Verified empirically for K=512 below.)

Runs the self-calibrated flagship (bias spreading as in
tools/crossframework_parity.py — random weights produce a degenerate
~3e-3-wide score band) on the reference's 11 example images: forward on
the default device, decode+NMS tail on the CPU backend (the full 10647^2
overlap matrix OOMs the chipless TPU AOT compiler).

Usage: python tools/quantify_prenms_pool.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = '/root/reference'
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(REPO, '.jax_cache'))
import jax.numpy as jnp  # noqa: E402

INPUT_HW = (416, 416)
NUM_CLASSES = 80
NMS_THRESHOLD = 0.45
CONFS = (0.3, 0.1, 0.05, 0.005)
KS = (512, 1024, 2048)

ANCHORS = [
    np.array([[112, 74], [149, 190], [370, 328]], np.float32),
    np.array([[28, 17], [56, 112], [57, 35]], np.float32),
    np.array([[9, 10], [13, 28], [28, 55]], np.float32),
]


def spread_predict_biases(params, probe_logits):
    """Flax-side analog of crossframework_parity._spread_predict_biases:
    rescale each predict conv's obj/class channels so confidences spread
    over decades instead of a ~3e-3 band (random-weight degeneracy)."""
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    # the per-scale PredictConv output convs (BatchNorm scales also carry
    # a 'bias' leaf, so filter by module name, not by channel count)
    pred_keys = sorted(
        {k[:-1] for k in flat if k[-1] == 'bias'
         and any('PredictConv' in part for part in k)})
    assert len(pred_keys) == len(probe_logits), (pred_keys,
                                                 len(probe_logits))
    for key, out in zip(pred_keys, probe_logits):
        k = np.asarray(flat[key + ('kernel',)])
        b = np.asarray(flat[key + ('bias',)])
        conv_obj = np.asarray(out[..., 4]) - b[4]
        lo, hi = np.percentile(conv_obj, [1, 99])
        s_obj = 12.0 / max(hi - lo, 1e-6)
        b_obj = 2.0 - s_obj * hi
        conv_rest = np.asarray(out[..., 5:]) - b[5:]
        s_rest = 6.0 / max(np.percentile(conv_rest, 99)
                           - np.percentile(conv_rest, 1), 1e-6)
        nk = k.copy()
        nk[..., 4] *= s_obj
        nk[..., 5:] *= s_rest
        nb = b.copy()
        nb[4] = b_obj
        nb[5:] *= s_rest
        flat[key + ('kernel',)] = jnp.asarray(nk)
        flat[key + ('bias',)] = jnp.asarray(nb)
    return flax.traverse_util.unflatten_dict(flat)


def main():
    from PIL import Image

    from multigriddet_tpu.data.annotations import letterbox_image
    from multigriddet_tpu.models import create_model
    from multigriddet_tpu.ops import batched_nms, decode_predictions

    model = create_model('multigriddet_darknet', num_classes=NUM_CLASSES)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *INPUT_HW, 3)),
        train=False))()
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    img_dir = os.path.join(REFERENCE, 'examples', 'images')
    paths = sorted(os.path.join(img_dir, p) for p in os.listdir(img_dir)
                   if p.lower().endswith(('.jpg', '.jpeg', '.png')))

    def load(path):
        with Image.open(path) as im:
            arr, _, _, _ = letterbox_image(im.convert('RGB'), INPUT_HW)
        return arr.astype(np.float32)[None] / 255.0

    probe = fwd(variables, jnp.asarray(load(paths[0])))
    params = spread_predict_biases(variables['params'],
                                   [np.asarray(p[0]) for p in probe])
    variables = {'params': params,
                 'batch_stats': variables['batch_stats']}

    cpu = jax.devices('cpu')[0]
    scale = np.asarray([INPUT_HW[1], INPUT_HW[0],
                        INPUT_HW[1], INPUT_HW[0]], np.float32)
    total = sum((INPUT_HW[0] // s) ** 2 * len(a)
                for s, a in zip((32, 16, 8), ANCHORS))

    def nms_tail(outs, k, conf):
        with jax.default_device(cpu):
            dec = decode_predictions([jnp.asarray(o) for o in outs],
                                     ANCHORS, INPUT_HW)
            xy, wh = dec[..., 0:2], dec[..., 2:4]
            tl = jnp.concatenate([xy - wh / 2.0, wh], axis=-1) * scale
            scores = dec[..., 4]
            classes = jnp.argmax(dec[..., 5:], axis=-1)
            return [np.asarray(v) for v in batched_nms(
                tl, scores, classes, conf, NMS_THRESHOLD,
                max_boxes=total, pre_nms_top_k=k, nms_method='diou',
                use_iol=True)]

    # lost[K][conf] aggregates over images
    agg = {k: {c: {'lost': 0, 'total': 0, 'max_lost_score': 0.0,
                   'images_affected': 0} for c in CONFS} for k in KS}
    verified = True
    for i, path in enumerate(paths):
        outs = [np.asarray(o) for o in fwd(variables,
                                           jnp.asarray(load(path)))]
        bx, cl, sc, valid = nms_tail(outs, total, min(CONFS))
        surv_scores = np.sort(sc[0][valid[0]])[::-1]
        n_surv = len(surv_scores)
        # survivor pool-rank: position of each survivor's score among ALL
        # candidate scores sorted descending
        with jax.default_device(cpu):
            dec = decode_predictions([jnp.asarray(o) for o in outs],
                                     ANCHORS, INPUT_HW)
            all_scores = np.sort(np.asarray(dec[0, :, 4]))[::-1]
        ranks = np.searchsorted(-all_scores, -surv_scores, side='left')
        for k in KS:
            for c in CONFS:
                above = surv_scores >= c
                lost = above & (ranks >= k)
                a = agg[k][c]
                a['total'] += int(above.sum())
                a['lost'] += int(lost.sum())
                a['images_affected'] += int(lost.any())
                if lost.any():
                    a['max_lost_score'] = max(a['max_lost_score'],
                                              float(surv_scores[lost][0]))
        # empirical spot-check of the monotonicity argument at K=512
        if i < 3:
            bx5, cl5, sc5, va5 = nms_tail(outs, 512, min(CONFS))
            s5 = np.sort(sc5[0][va5[0]])[::-1]
            expect = surv_scores[ranks < 512]
            ok = (len(s5) == len(expect)
                  and np.allclose(s5, expect, atol=1e-6))
            verified &= bool(ok)
        print(f'{os.path.basename(path)}: {n_surv} full-pool survivors, '
              f'scores [{surv_scores[-1]:.4f}, {surv_scores[0]:.4f}]')

    print(f'\ntruncation-monotonicity spot-check (K=512, 3 images): '
          f'{"PASS" if verified else "FAIL"}')
    print(f'{"K":>6} {"conf":>6} {"survivors":>10} {"lost":>6} '
          f'{"lost%":>7} {"imgs":>5} {"max lost score":>15}')
    for k in KS:
        for c in CONFS:
            a = agg[k][c]
            pct = 100.0 * a['lost'] / max(a['total'], 1)
            print(f'{k:>6} {c:>6} {a["total"]:>10} {a["lost"]:>6} '
                  f'{pct:>6.2f}% {a["images_affected"]:>5} '
                  f'{a["max_lost_score"]:>15.4f}')
    out_path = os.path.join(REPO, 'docs', 'prenms_pool.json')
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, 'w') as f:
        json.dump({str(k): {str(c): agg[k][c] for c in CONFS}
                   for k in KS}, f, indent=1)
    print(f'saved {out_path}')


if __name__ == '__main__':
    main()
