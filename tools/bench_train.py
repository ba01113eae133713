#!/usr/bin/env python3
"""Training-step throughput + MFU on the chip.

Measures the full production train step (forward + MultiGridLoss +
backward + adam update, bf16 compute) on the 45M flagship at 416x416,
batch 32, synthetic encoded targets — the counterpart of bench.py's
inference number, so training perf regressions are visible too.

Prints one JSON line: {img_per_s, step_ms, mfu_v5e_bf16}.
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
import optax  # noqa: E402

from multigriddet_tpu.losses import LossConfig  # noqa: E402
from multigriddet_tpu.models import create_model  # noqa: E402
from multigriddet_tpu.training.state import TrainState  # noqa: E402
from multigriddet_tpu.training.steps import make_train_step  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
REMAT = sys.argv[3] if len(sys.argv) > 3 else 'none'  # none | conv | full
HW = (SIDE, SIDE)
NUM_CLASSES = 80
REPEATS = 10
PEAK_BF16 = 197e12

ANCHORS = [
    np.array([[112, 74], [149, 190], [370, 328]], np.float32),
    np.array([[28, 17], [56, 112], [57, 35]], np.float32),
    np.array([[9, 10], [13, 28], [28, 55]], np.float32),
]


def main():
    rng = np.random.RandomState(0)
    remat = {'none': False, 'conv': 'conv', 'full': 'full'}[REMAT]
    model = create_model('multigriddet_darknet', num_classes=NUM_CLASSES,
                         dtype=jnp.bfloat16, remat=remat)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False))()
    tx = optax.adam(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables['params'],
        batch_stats=variables['batch_stats'],
        opt_state=tx.init(variables['params']))

    images = jnp.asarray(rng.rand(BATCH, *HW, 3).astype(np.float32))
    ch = 3 + NUM_CLASSES + 5
    y_true = tuple(
        jnp.asarray(rng.rand(BATCH, g, g, ch).astype(np.float32) * 0.01)
        for g in (HW[0] // 32, HW[0] // 16, HW[0] // 8))

    step = make_train_step(model, tx, ANCHORS, NUM_CLASSES, HW,
                           LossConfig(), donate=True)

    flops = None
    try:
        # make_train_step returns a jitted fn; lower it directly
        cost = step.lower(state, images, y_true).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
    except Exception:
        pass

    # two untimed steps: the first executed program in a fresh process
    # absorbs tunnel warm-up beyond compile
    for _ in range(2):
        state, metrics = step(state, images, y_true)
        jax.block_until_ready(metrics['loss'])
        float(metrics['loss'])

    t0 = time.time()
    for _ in range(REPEATS):
        state, metrics = step(state, images, y_true)
    jax.block_until_ready(metrics['loss'])
    loss = float(metrics['loss'])
    dt = (time.time() - t0) / REPEATS
    assert np.isfinite(loss), loss

    out = {
        'metric': f'train_images_per_sec_{SIDE}_b{BATCH}_remat_{REMAT}',
        'img_per_s': round(BATCH / dt, 1),
        'step_ms': round(dt * 1e3, 2),
        'loss': round(loss, 4),
    }
    if flops and flops > 0:
        out['mfu_v5e_bf16'] = round(flops / dt / PEAK_BF16, 4)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
