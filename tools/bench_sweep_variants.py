#!/usr/bin/env python3
"""Compare greedy-fori vs cluster-iteration sweeps inside the fused step.

The decompose profile (tools/profile_infer_decompose.py) shows the NMS
stage costs ~3.6 ms of the 54.5 ms fused step @416 b128 K=1024.  The
greedy sweep is K serial fori_loop steps; Cluster-NMS (arXiv:2005.03572)
reaches the IDENTICAL keep set as a fixed point of a few whole-matrix
iterations — far fewer (but wider) steps.  This tool times both inside
the full fused program and asserts keep-set equality on random pools.

Usage: python tools/bench_sweep_variants.py [BATCH] [SIDE] [K]
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
from multigriddet_tpu.ops.nms import (_cluster_nms_sweep,  # noqa: E402
                                      _greedy_sweep, _overlap_matrix,
                                      NEG_INF)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
HW = (SIDE, SIDE)
NC = 80
CONFIDENCE = 0.1
LOOP = 16

ANCHORS = [
    np.array([[112, 74], [149, 190], [370, 328]], np.float32),
    np.array([[28, 17], [56, 112], [57, 35]], np.float32),
    np.array([[9, 10], [13, 28], [28, 55]], np.float32),
]


from multigriddet_tpu.utils.profiling import (  # noqa: E402
    null_wall, timed_op)


def timed(fn, *args, repeats=3):
    return timed_op(fn, *args, loop=LOOP, repeats=repeats)


def main():
    rng = np.random.RandomState(0)
    model = create_model('multigriddet_darknet', num_classes=NC,
                         dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False))()
    images = jnp.asarray(rng.rand(BATCH, *HW, 3).astype(np.float32))
    scale = jnp.asarray([HW[1], HW[0], HW[1], HW[0]], jnp.float32)
    anchors = [np.asarray(a, np.float32) for a in ANCHORS]

    def full(sweep):
        def fn(images, variables):
            outs = model.apply(variables, images, train=False)
            dec = decode_predictions(outs, anchors, HW)
            xy, wh = dec[..., 0:2], dec[..., 2:4]
            tl = jnp.concatenate([xy - wh / 2.0, wh], axis=-1) * scale
            scores = dec[..., 4]
            classes = jnp.argmax(dec[..., 5:], axis=-1)

            def one(bx, sc, cl):
                sc = jnp.where(sc >= CONFIDENCE, sc, NEG_INF)
                top_sc, idx = jax.lax.top_k(sc, K)
                top_bx, top_cl = bx[idx], cl[idx]
                valid = top_sc > NEG_INF / 2
                overlap = _overlap_matrix(top_bx, 'diou', True)
                keep = sweep(overlap, valid, 0.45)
                keep_sc = jnp.where(keep, top_sc, NEG_INF)
                out_sc, out_idx = jax.lax.top_k(keep_sc, 100)
                return top_bx[out_idx], top_cl[out_idx], out_sc
            return jax.vmap(one)(tl, scores, classes)
        return fn

    # keep-set equality on clustered random pools (worst-ish case: many
    # overlapping boxes -> long suppression chains)
    kk = 512
    r2 = np.random.RandomState(1)
    centers = r2.rand(8, kk, 2).astype(np.float32) * 200
    sizes = 20 + r2.rand(8, kk, 2).astype(np.float32) * 60
    bxs = np.concatenate([centers - sizes / 2, sizes], -1)
    ovl = jax.vmap(lambda b: _overlap_matrix(b, 'diou', True))(
        jnp.asarray(bxs))
    val = jnp.ones((8, kk), bool)
    kg = jax.jit(jax.vmap(lambda o, v: _greedy_sweep(o, v, 0.45)))(ovl, val)
    kc = jax.jit(jax.vmap(lambda o, v: _cluster_nms_sweep(o, v, 0.45)))(
        ovl, val)
    same = bool(jnp.all(kg == kc))
    print(f'keep-set equal on 8x{kk} clustered random pools: {same} '
          f'(greedy keeps {int(kg.sum())}, cluster {int(kc.sum())})')

    t_g = timed(full(_greedy_sweep), images, variables)
    t_c = timed(full(_cluster_nms_sweep), images, variables)
    print(f'b{BATCH} @{SIDE} K={K} (null {null_wall()*1e3:.1f} ms)')
    print(f'full greedy-fori : {t_g*1e3:8.2f} ms  {BATCH/t_g:8.1f} img/s')
    print(f'full cluster-iter: {t_c*1e3:8.2f} ms  {BATCH/t_c:8.1f} img/s')


if __name__ == '__main__':
    main()
