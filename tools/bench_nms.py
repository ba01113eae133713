#!/usr/bin/env python3
"""Profile XLA vs Pallas NMS on the real chip (r1 VERDICT weak #3).

Two measurements per (backend, K):
  * nms-only: ``batched_nms`` on random pre-generated boxes;
  * fused: the full ``make_infer_step`` (forward + decode + NMS) on the
    flagship @416, where NMS is a small tail of the program.

Prints one JSON line per row; run on the default (TPU) env from /root/repo.
"""

import json
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

from multigriddet_tpu.ops import batched_nms  # noqa: E402

BATCH = 128
REPEATS = 20


def bench(fn, *args):
    # two untimed calls: the FIRST executed program in a fresh process
    # absorbs ~2s/call of tunnel warm-up beyond compile (measured), so a
    # single warmup is not enough
    for _ in range(2):
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(out[2]))
    t0 = time.time()
    for _ in range(REPEATS):
        out = fn(*args)
    jax.block_until_ready(out)
    # force one host fetch so the tunnel RTT is paid outside the loop
    float(jnp.sum(out[2]))
    return (time.time() - t0) / REPEATS


def main():
    # NOTE: independent dispatches through the tunnel do NOT pipeline —
    # each call is floored at the ~29.5 ms round trip, so every measured
    # config must be slow enough per call (big BATCH) or read as "<= RTT".
    rng = np.random.RandomState(0)
    rows = []
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', 'nms'):
        nb = 256  # keep per-call time above the tunnel RTT floor
        for k in (512, 1024, 2048):
            n = 10647 if k == 2048 else k * 2
            boxes = rng.uniform(0, 400, (nb, n, 4)).astype(np.float32)
            boxes[..., 2:] = rng.uniform(10, 80, (nb, n, 2))
            scores = rng.uniform(0, 1, (nb, n)).astype(np.float32)
            classes = rng.randint(0, 80, (nb, n)).astype(np.int32)
            args = (jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(classes))
            for backend in ('xla', 'pallas', 'pallas_fused'):
                import functools
                fn = jax.jit(functools.partial(
                    batched_nms, confidence=0.05, nms_threshold=0.45,
                    max_boxes=100, pre_nms_top_k=k, nms_method='diou',
                    use_iol=True, backend=backend))
                dt = bench(fn, *args)
                rows.append({'bench': 'nms_only', 'backend': backend,
                             'K': k, 'N': n, 'batch': nb,
                             'ms': round(dt * 1e3, 2),
                             'img_per_s': round(nb / dt, 1)})
                print(json.dumps(rows[-1]))

    if which in ('all', 'fused'):
        from multigriddet_tpu.models import create_model
        from multigriddet_tpu.training.steps import make_infer_step
        from multigriddet_tpu.utils.anchors import DEFAULT_COCO_ANCHORS

        model = create_model('multigriddet_darknet', num_classes=80,
                             dtype=jnp.bfloat16)
        images = jnp.asarray(
            rng.randint(0, 255, (BATCH, 416, 416, 3)).astype(np.uint8))
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 3)),
            train=False))()
        for backend, ks in (('xla', (512, 1024, 2048)),
                            ('pallas', (1024,)),
                            ('pallas_fused', (1024,))):
            for k in ks:
                step = make_infer_step(
                    model, DEFAULT_COCO_ANCHORS, (416, 416),
                    confidence=0.05, pre_nms_top_k=k, nms_backend=backend)
                dt = bench(step, variables, images)
                rows.append({'bench': 'fused_416', 'backend': backend,
                             'K': k, 'batch': BATCH,
                             'ms': round(dt * 1e3, 2),
                             'img_per_s': round(BATCH / dt, 1)})
                print(json.dumps(rows[-1]))


if __name__ == '__main__':
    main()
