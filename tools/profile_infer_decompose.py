#!/usr/bin/env python3
"""Decompose the fused inference step's cost on the chip.

bench.py's headline (fused forward + decode + NMS @416 b128, K=1024)
runs at ~0.59 MFU while the bare forward reaches ~0.77 — this tool
attributes the gap by timing nested prefixes of the fused program:

  fwd          — model.apply (BN eval), bf16
  fwd_decode   — + decode_predictions + box/score/class extraction
  fwd_topk     — + confidence mask + top_k(K) candidate selection
  full         — + overlap matrix + greedy sweep + final top_k

NOTE: this reproduces the round-3 PRE-optimization chain whose
attribution (fwd 46.7 / +3.3 / +1.0 / +3.6 ms @416 b128 K=1024)
motivated the cluster-sweep default and the compact decode_for_nms;
the shipped make_infer_step now runs those instead (see
tools/bench_sweep_variants.py for the A/B).

Timing uses the same loop-serialized in-program harness as
tools/profile_train_decompose.py (independent dispatches do not
pipeline through the axon tunnel — see that tool's docstring).

Usage: python tools/profile_infer_decompose.py [BATCH] [SIDE] [K]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(REPO, '.jax_cache'))
import jax.numpy as jnp  # noqa: E402

from multigriddet_tpu.models import create_model  # noqa: E402
from multigriddet_tpu.ops import decode_predictions  # noqa: E402
from multigriddet_tpu.ops.nms import (_greedy_sweep,  # noqa: E402
                                      _overlap_matrix, NEG_INF)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
HW = (SIDE, SIDE)
NC = 80
CONFIDENCE = 0.1
PEAK_BF16 = 197e12
LOOP = 16

ANCHORS = [
    np.array([[112, 74], [149, 190], [370, 328]], np.float32),
    np.array([[28, 17], [56, 112], [57, 35]], np.float32),
    np.array([[9, 10], [13, 28], [28, 55]], np.float32),
]


from multigriddet_tpu.utils.profiling import (  # noqa: E402
    null_wall, timed_op)


def timed(fn, *args, repeats=3):
    return timed_op(fn, *args, loop=LOOP, repeats=repeats, with_mfu=True)


def main():
    rng = np.random.RandomState(0)
    model = create_model('multigriddet_darknet', num_classes=NC,
                         dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False))()
    images = jnp.asarray(rng.rand(BATCH, *HW, 3).astype(np.float32))
    scale = jnp.asarray([HW[1], HW[0], HW[1], HW[0]], jnp.float32)
    anchors = [np.asarray(a, np.float32) for a in ANCHORS]

    def fwd(images, variables):
        return model.apply(variables, images, train=False)

    def decode(images, variables):
        outs = model.apply(variables, images, train=False)
        dec = decode_predictions(outs, anchors, HW)
        xy, wh = dec[..., 0:2], dec[..., 2:4]
        tl = jnp.concatenate([xy - wh / 2.0, wh], axis=-1) * scale
        return tl, dec[..., 4], jnp.argmax(dec[..., 5:], axis=-1)

    def topk(images, variables):
        tl, scores, classes = decode(images, variables)

        def one(bx, sc, cl):
            sc = jnp.where(sc >= CONFIDENCE, sc, NEG_INF)
            top_sc, idx = jax.lax.top_k(sc, K)
            return bx[idx], cl[idx], top_sc
        return jax.vmap(one)(tl, scores, classes)

    def full(images, variables):
        tl, scores, classes = decode(images, variables)

        def one(bx, sc, cl):
            sc = jnp.where(sc >= CONFIDENCE, sc, NEG_INF)
            top_sc, idx = jax.lax.top_k(sc, K)
            top_bx, top_cl = bx[idx], cl[idx]
            valid = top_sc > NEG_INF / 2
            overlap = _overlap_matrix(top_bx, 'diou', True)
            keep = _greedy_sweep(overlap, valid, 0.45)
            keep_sc = jnp.where(keep, top_sc, NEG_INF)
            out_sc, out_idx = jax.lax.top_k(keep_sc, 100)
            return top_bx[out_idx], top_cl[out_idx], out_sc
        return jax.vmap(one)(tl, scores, classes)

    rows = [
        ('fwd', *timed(fwd, images, variables)),
        ('fwd_decode', *timed(decode, images, variables)),
        ('fwd_topk', *timed(topk, images, variables)),
        ('full', *timed(full, images, variables)),
    ]
    print(f'\nb{BATCH} @{SIDE} K={K} (bf16, loop-serialized x{LOOP}, '
          f'null {null_wall()*1e3:.1f} ms)')
    print(f'{"program":<12} {"ms":>8} {"img/s":>8} {"MFU":>6}')
    base = None
    for name, dt, mfu in rows:
        extra = '' if base is None else f'  (+{(dt-base)*1e3:.2f} ms)'
        if name == 'fwd':
            base = dt
        print(f'{name:<12} {dt*1e3:8.2f} {BATCH/dt:8.1f} {mfu:6.3f}{extra}')


if __name__ == '__main__':
    main()
