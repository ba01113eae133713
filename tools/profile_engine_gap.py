#!/usr/bin/env python3
"""Attribute the shipped-engine vs raw-fused-step inference gap.

BENCH_r03 measured 2,347.8 img/s with the raw fused step wrapped in an
extra jit that reduced the output to ONE scalar (sum(scores*valid));
BENCH_r04 measured 2,137.5 img/s through ``MultiGridInference``'s
then-packed program — a ~9% drop the VERDICT asked to attribute
(r4 #3).  Findings (docs/STATUS.md round 5):

  * the packed [B,K,7] concat cost ~6% of the whole fused program at
    b128 (2,170 packed-lazy vs 2,327 tuple-lazy); a [B,7,K] layout
    (K on the 128-lane minor dim) recovered only ~1% — the concat
    itself, not the lane padding, is the cost;
  * four batched device_get transfers are CHEAPER than one packed
    fetch (1,455 vs 1,402 img/s forced-per-batch), so the engine now
    serves the raw 4-tuple and fetches with ``fetch_detections``;
  * forcing every batch (no pipelining) costs ~28%; the engine's
    pipeline_depth=4 serve loop recovers it.

This times, in ONE process at the bench's exact operating point
(b128 @416, bfloat16, K=1024, diou), the same weights through:

  1. engine._infer tuple output, fetch_detections per batch (serving
     forced path)
  2. engine._infer tuple output, forced at end only (bench / pipelined
     steady state)
  3. pack_outputs=True variant, forced at end (the rejected design)
  4. scalar-reduced wrapper (r3 bench methodology, the program floor)

Usage: python tools/profile_engine_gap.py [iters=12]
Prints one JSON line.
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
BATCH, HW = 128, (416, 416)


def rate(fn, inputs, force_each=None, warm=2, iters=ITERS):
    """force_each: callable applied per batch (fetch/force), or None to
    dispatch all and block at the end."""
    for i in range(warm):
        jax.block_until_ready(fn(inputs[i % 2]))
    t0 = time.time()
    outs = []
    for i in range(iters):
        o = fn(inputs[i % 2])
        if force_each is not None:
            force_each(o)
        else:
            outs.append(o)
    for o in outs:
        jax.block_until_ready(o)
    return BATCH * iters / (time.time() - t0)


def main():
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.inference import MultiGridInference
    from multigriddet_tpu.training.steps import (fetch_detections,
                                                 make_infer_step)

    config = load_config(os.path.join(REPO, 'configs/infer_config.yaml'),
                         config_type='infer')
    config.setdefault('input', {})['input_shape'] = [*HW, 3]
    engine = MultiGridInference(config)
    rng = np.random.RandomState(0)
    inputs = [jnp.asarray(rng.randint(0, 255, (BATCH, *HW, 3), np.uint8))
              for _ in range(2)]

    step_kw = dict(
        confidence=engine.confidence, nms_threshold=engine.nms_threshold,
        nms_method=engine.nms_method, use_iol=engine.use_iol,
        max_boxes=engine.max_boxes, pre_nms_top_k=engine.pre_nms_top_k,
        class_aware=engine.class_aware, nms_backend=engine.nms_backend)

    tuple_fetched = rate(lambda x: engine._infer(engine.variables, x),
                         inputs, force_each=fetch_detections)
    tuple_lazy = rate(lambda x: engine._infer(engine.variables, x),
                      inputs)

    packed = make_infer_step(engine.model, engine.spec['anchors'], HW,
                             pack_outputs=True, **step_kw)
    packed_lazy = rate(lambda x: packed(engine.variables, x), inputs)

    raw = make_infer_step(engine.model, engine.spec['anchors'], HW,
                          pack_outputs=False, **step_kw)

    @jax.jit
    def scalar(variables, images):
        _, _, scores, valid = raw(variables, images)
        return jnp.sum(scores * valid)

    scalar_rate = rate(lambda x: scalar(engine.variables, x), inputs)

    print(json.dumps({
        'metric': 'engine_gap_b128_416',
        'tuple_fetched_img_per_s': round(tuple_fetched, 1),
        'tuple_lazy_img_per_s': round(tuple_lazy, 1),
        'packed_lazy_img_per_s': round(packed_lazy, 1),
        'scalar_img_per_s': round(scalar_rate, 1),
        'engine_over_scalar': round(tuple_lazy / scalar_rate, 3),
        'iters': ITERS,
    }))


if __name__ == '__main__':
    main()
