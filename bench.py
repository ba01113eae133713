#!/usr/bin/env python3
"""Driver benchmark: single-chip inference throughput @416.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference reports ~30 FPS at 608x608 on a GTX 1060
(/root/reference/README.md:617; BASELINE.md).  The driver metric
(BASELINE.json) is images/sec/chip @416 inference — the full fused
pipeline (forward + on-device decode + NMS), bfloat16 compute, uint8
host->device transfer, measured with a per-batch host-visible result so
async dispatch can't hide work.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from multigriddet_tpu.models import create_model
from multigriddet_tpu.ops.decode import decode_predictions
from multigriddet_tpu.ops.nms import batched_nms
from multigriddet_tpu.utils.anchors import DEFAULT_COCO_ANCHORS

BASELINE_FPS = 30.0  # reference: GTX 1060 @608 (README.md:617)


def main():
    batch = 128
    hw = (416, 416)
    model = create_model('multigriddet_darknet', num_classes=80,
                         dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    inputs = [jnp.asarray(rng.randint(0, 255, (batch, *hw, 3), np.uint8))
              for _ in range(2)]
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *hw, 3), jnp.float32),
                           train=False))()

    @jax.jit
    def infer(variables, images):
        x = images.astype(jnp.float32) / 255.0
        outs = model.apply(variables, x, train=False)
        dec = decode_predictions(outs, DEFAULT_COCO_ANCHORS, hw)
        xy, wh = dec[..., 0:2], dec[..., 2:4]
        tl = jnp.concatenate([xy - wh / 2.0, wh], axis=-1) * hw[0]
        _, _, scores, valid = batched_nms(
            tl, dec[..., 4], jnp.argmax(dec[..., 5:], axis=-1),
            0.1, 0.45, max_boxes=100, pre_nms_top_k=512)
        # tiny host-visible reduction so timing can't skip the work
        return jnp.sum(scores * valid)

    float(infer(variables, inputs[0]))  # compile
    iters = 12
    t0 = time.time()
    outs = [infer(variables, inputs[i % 2]) for i in range(iters)]
    _ = sum(float(o) for o in outs)
    dt = time.time() - t0
    ips = batch * iters / dt

    # MFU: XLA-reported FLOPs of the compiled program / v5e peak (197
    # TFLOP/s bf16) — so perf regressions are visible as a hardware
    # fraction, not just img/s
    mfu = None
    try:
        cost = (jax.jit(infer).lower(variables, inputs[0])
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
        if flops > 0:
            mfu = round(flops * iters / dt / 197e12, 4)
    except Exception:
        pass
    print(json.dumps({
        'metric': 'inference_images_per_sec_416',
        'value': round(ips, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(ips / BASELINE_FPS, 2),
        'mfu_v5e_bf16': mfu,
    }))


if __name__ == '__main__':
    main()
