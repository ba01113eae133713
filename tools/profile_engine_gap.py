#!/usr/bin/env python3
"""Attribute the shipped-engine vs raw-fused-step inference gap.

BENCH_r03 measured 2,347.8 img/s with the raw fused step wrapped in an
extra jit that reduced the output to ONE scalar (sum(scores*valid));
BENCH_r04 measured 2,137.5 img/s through ``MultiGridInference``'s
packed program — a ~9% drop the VERDICT asked to attribute (r4 #3).
The candidates:

  a. the packed [B,K,7] concat + its HBM write (program cost),
  b. forcing the packed per-batch output vs a scalar (transfer/force
     cost on a tunneled device),
  c. per-call Python dispatch in the engine loop.

This times, in ONE process at the bench's exact operating point
(b128 @416, bfloat16, K=1024, diou), the same weights through:

  1. engine._infer, packed output, forced per batch   (r4 bench)
  2. engine._infer, packed output, forced at end only
  3. raw make_infer_step, 4-tuple output, forced at end
  4. scalar-reduced wrapper (r3 bench methodology)

Usage: python tools/profile_engine_gap.py [iters=12]
Prints one JSON line {packed_forced, packed_lazy, tuple_lazy, scalar}.
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


def rate(fn, inputs, force_each, finish=None, warm=2, iters=ITERS):
    for i in range(warm):
        jax.block_until_ready(fn(inputs[i % 2]))
    t0 = time.time()
    outs = []
    for i in range(iters):
        o = fn(inputs[i % 2])
        if force_each:
            jax.block_until_ready(o)
        else:
            outs.append(o)
    for o in outs:
        jax.block_until_ready(o)
    if finish is not None:
        finish(outs[-1] if outs else o)
    return BATCH * iters / (time.time() - t0)


def main():
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.inference import MultiGridInference
    from multigriddet_tpu.training.steps import make_infer_step

    config = load_config(os.path.join(REPO, 'configs/infer_config.yaml'),
                         config_type='infer')
    config.setdefault('input', {})['input_shape'] = [*HW, 3]
    engine = MultiGridInference(config)
    rng = np.random.RandomState(0)
    inputs = [jnp.asarray(rng.randint(0, 255, (BATCH, *HW, 3), np.uint8))
              for _ in range(2)]

    packed_forced = rate(lambda x: engine._infer(engine.variables, x),
                         inputs, force_each=True)
    packed_lazy = rate(lambda x: engine._infer(engine.variables, x),
                       inputs, force_each=False,
                       finish=lambda o: np.asarray(o))

    raw = make_infer_step(engine.model, engine.spec['anchors'], HW,
                          confidence=engine.confidence,
                          nms_threshold=engine.nms_threshold,
                          nms_method=engine.nms_method,
                          use_iol=engine.use_iol,
                          max_boxes=engine.max_boxes,
                          pre_nms_top_k=engine.pre_nms_top_k,
                          pack_outputs=False)
    tuple_lazy = rate(lambda x: raw(engine.variables, x), inputs,
                      force_each=False)

    @jax.jit
    def scalar(variables, images):
        _, _, scores, valid = raw(variables, images)
        return jnp.sum(scores * valid)

    scalar_rate = rate(lambda x: scalar(engine.variables, x), inputs,
                       force_each=False,
                       finish=lambda o: float(o))

    print(json.dumps({
        'metric': 'engine_gap_b128_416',
        'packed_forced_img_per_s': round(packed_forced, 1),
        'packed_lazy_img_per_s': round(packed_lazy, 1),
        'tuple_lazy_img_per_s': round(tuple_lazy, 1),
        'scalar_img_per_s': round(scalar_rate, 1),
        'iters': ITERS,
    }))


if __name__ == '__main__':
    main()
