#!/usr/bin/env python3
"""End-to-end REAL-DATA training throughput: the system users run.

bench.py's train leg feeds pre-staged synthetic tensors and
tools/bench_pipeline.py measures the input pipeline alone; neither
measures the overlapped loader + device-stage + train-step system that
``train.py`` actually runs (the reference's hot path being replaced:
generators.py:1766-2133).  This tool does: synthetic JPEGs on disk ->
HostImageLoader (threaded decode + RAM cache) -> jitted on-device
aug + 9-cell encode -> jitted train step (forward + MultiGridLoss +
backward + adam, bf16), sustained over full epochs exactly like
``MultiGridTrainer._run_epoch`` (training/trainer.py:223-263): metrics
accumulate on device and are fetched once per epoch.

Epoch 1 is the warm-up (XLA compiles + RAM decoded-image cache fill);
the next ``EPOCHS`` epochs are timed individually.  A pure-step leg
(same step, one staged batch, no input pipeline) runs afterwards in the
same process so the ratio is apples-to-apples.

Usage: python tools/bench_train_e2e.py [batch=32] [side=416] [epochs=2]
Prints one JSON line:
  {e2e_img_per_s, e2e_img_per_s_min/max, pure_step_img_per_s,
   e2e_over_pure, epochs, steps_per_epoch, loss}
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(REPO, '.jax_cache'))
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from bench_pipeline import ANCHORS, make_dataset  # noqa: E402
from multigriddet_tpu.data import MultiGridDataGenerator  # noqa: E402
from multigriddet_tpu.losses import LossConfig  # noqa: E402
from multigriddet_tpu.models import create_model  # noqa: E402
from multigriddet_tpu.training.state import TrainState  # noqa: E402
from multigriddet_tpu.training.steps import make_train_step  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
EPOCHS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
HW = (SIDE, SIDE)
NUM_CLASSES = 80
# >= 16 steps/epoch so per-epoch timing is not quantized by one step
N_IMAGES = max(16 * BATCH, 512)


def run_epoch(gen, state, step):
    """One overlapped epoch, trainer-style: dispatch every step, fetch
    the aggregated metrics once at the end (trainer.py:223-263)."""
    t0 = time.time()
    agg = None
    n = 0
    for images, y_true, _ in gen:
        state, metrics = step(state, images, y_true)
        agg = (metrics['loss'] if agg is None
               else agg + metrics['loss'])
        n += 1
    loss = float(agg) / max(n, 1)  # the host fetch: syncs the epoch
    dt = time.time() - t0
    return state, n, dt, loss


def main():
    lines = make_dataset('/tmp/bench_train_e2e_ds', N_IMAGES)
    gen = MultiGridDataGenerator(
        lines, ANCHORS, NUM_CLASSES, HW, BATCH, max_boxes=100,
        augment={'enabled': True, 'mosaic_prob': 0.3, 'mixup_prob': 0.1},
        train=True, num_workers=8, cache_images=True)

    model = create_model('multigriddet_darknet', num_classes=NUM_CLASSES,
                         dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False))()
    tx = optax.adam(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables['params'],
        batch_stats=variables['batch_stats'],
        opt_state=tx.init(variables['params']))
    step = make_train_step(model, tx, ANCHORS, NUM_CLASSES, HW,
                           LossConfig(), donate=True)

    # warm epoch: compiles the device-stage + train-step programs and
    # fills the RAM decoded-image cache (steady state = epoch >= 2)
    state, steps, dt, loss = run_epoch(gen, state, step)
    print(f'warm epoch: {steps} steps in {dt:.1f}s '
          f'(loss {loss:.3f})', file=sys.stderr)
    assert np.isfinite(loss), loss

    rates = []
    for e in range(EPOCHS):
        state, steps, dt, loss = run_epoch(gen, state, step)
        rates.append(steps * BATCH / dt)
        print(f'epoch {e + 1}: {steps * BATCH / dt:.1f} img/s '
              f'({steps} steps, {dt:.1f}s, loss {loss:.3f})',
              file=sys.stderr)
        assert np.isfinite(loss), loss

    # pure-step leg: identical compiled step on ONE staged batch —
    # isolates what the input pipeline costs on top
    for images, y_true, _ in gen:
        break
    jax.block_until_ready(images)
    for _ in range(2):
        state, metrics = step(state, images, y_true)
        float(metrics['loss'])
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        state, metrics = step(state, images, y_true)
    jax.block_until_ready(metrics['loss'])
    pure = BATCH * reps / (time.time() - t0)
    gen.close()

    e2e = float(np.median(rates))
    print(json.dumps({
        'metric': f'train_e2e_images_per_sec_{SIDE}_b{BATCH}',
        'e2e_img_per_s': round(e2e, 1),
        'e2e_img_per_s_min': round(min(rates), 1),
        'e2e_img_per_s_max': round(max(rates), 1),
        'pure_step_img_per_s': round(pure, 1),
        'e2e_over_pure': round(e2e / pure, 3),
        'epochs': EPOCHS,
        'steps_per_epoch': steps,
        'loss': round(loss, 4),
    }))


if __name__ == '__main__':
    main()
