#!/usr/bin/env python3
"""Driver benchmark: single-chip inference throughput @416.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference reports ~30 FPS at 608x608 on a GTX 1060
(/root/reference/README.md:617; BASELINE.md).  The driver metric
(BASELINE.json) is images/sec/chip @416 inference — full pipeline
(forward + on-device decode + NMS), bfloat16 compute.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from multigriddet_tpu.models import create_model
from multigriddet_tpu.training.steps import make_infer_step
from multigriddet_tpu.utils.anchors import DEFAULT_COCO_ANCHORS

BASELINE_FPS = 30.0  # reference: GTX 1060 @608 (README.md:617)


def main():
    batch = 16
    hw = (416, 416)
    model = create_model('multigriddet_darknet', num_classes=80,
                         dtype=jnp.bfloat16)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, *hw, 3).astype(np.float32))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images[:1],
                           train=False))()
    infer = make_infer_step(model, DEFAULT_COCO_ANCHORS, hw,
                            confidence=0.1, max_boxes=100,
                            pre_nms_top_k=512)
    # warmup / compile
    out = infer(variables, images)
    jax.block_until_ready(out)
    # timed
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = infer(variables, images)
    jax.block_until_ready(out)
    dt = time.time() - t0
    ips = batch * iters / dt
    print(json.dumps({
        'metric': 'inference_images_per_sec_416',
        'value': round(ips, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(ips / BASELINE_FPS, 2),
    }))


if __name__ == '__main__':
    main()
