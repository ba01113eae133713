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

A second leg re-runs the same epochs with ``cache_images_device=True``
(the HBM image bank, data/pipeline.py:_DeviceImageCache): epoch 1 fills
the bank from the host path, epochs >= 2 gather pixels ON DEVICE so the
host link carries only boxes + row indices (~65 KB/batch at b32) — the
steady state a tunneled / bandwidth-limited host link cannot slow down.

Usage: python tools/bench_train_e2e.py [batch=32] [side=416] [epochs=2]
Prints one JSON line:
  {e2e_img_per_s, e2e_img_per_s_min/max, hbm_img_per_s (+min/max),
   pure_step_img_per_s, e2e_over_pure, hbm_over_pure, epochs,
   steps_per_epoch, loss}
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
from multigriddet_tpu.training.steps import (  # noqa: E402
    make_fused_train_step, make_train_step)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
EPOCHS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
# which legs to run (argv[4], comma-set): 'stream' = host-streaming
# epochs, 'hbm' = HBM-bank epochs through the two-program path, 'fused'
# = single-program make_fused_train_step epochs.  The pure-step
# denominator always runs.  Default: all three.
LEGS = set(sys.argv[4].split(',')) if len(sys.argv) > 4 else {
    'stream', 'hbm', 'fused'}
HW = (SIDE, SIDE)
NUM_CLASSES = 80
# >= 16 steps/epoch so per-epoch timing is not quantized by one step
N_IMAGES = max(16 * BATCH, 512)
AUG = {'enabled': True, 'mosaic_prob': 0.3, 'mixup_prob': 0.1}


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

    rates = []
    if 'stream' in LEGS:
        gen = MultiGridDataGenerator(
            lines, ANCHORS, NUM_CLASSES, HW, BATCH, max_boxes=100,
            augment=AUG, train=True, num_workers=8, cache_images=True)
        # warm epoch: compiles the device-stage + train-step programs
        # and fills the RAM decoded-image cache (steady state = ep >= 2)
        state, steps, dt, loss = run_epoch(gen, state, step)
        print(f'warm epoch: {steps} steps in {dt:.1f}s '
              f'(loss {loss:.3f})', file=sys.stderr)
        assert np.isfinite(loss), loss
        for e in range(EPOCHS):
            state, steps, dt, loss = run_epoch(gen, state, step)
            rates.append(steps * BATCH / dt)
            print(f'epoch {e + 1}: {steps * BATCH / dt:.1f} img/s '
                  f'({steps} steps, {dt:.1f}s, loss {loss:.3f})',
                  file=sys.stderr)
            assert np.isfinite(loss), loss
        gen.close()

    # HBM-bank generator: shared by the 'hbm' and 'fused' legs; the
    # first pass over it fills the bank (host path), later epochs
    # gather pixels on device — host link carries boxes + indices only
    hbm_gen = MultiGridDataGenerator(
        lines, ANCHORS, NUM_CLASSES, HW, BATCH, max_boxes=100,
        augment=AUG, train=True, num_workers=8, cache_images=True,
        cache_images_device=True)
    hbm_rates = []
    if 'hbm' in LEGS:
        state, steps, dt, loss = run_epoch(hbm_gen, state, step)
        print(f'hbm warm epoch: {steps} steps in {dt:.1f}s '
              f'(bank {hbm_gen._dcache.bytes / 1e6:.0f} MB)',
              file=sys.stderr)
        for e in range(EPOCHS):
            state, steps, dt, loss = run_epoch(hbm_gen, state, step)
            hbm_rates.append(steps * BATCH / dt)
            print(f'hbm epoch {e + 1}: {steps * BATCH / dt:.1f} img/s '
                  f'({steps} steps, {dt:.1f}s, loss {loss:.3f})',
                  file=sys.stderr)
            assert np.isfinite(loss), loss

    fused_rates = []
    if 'fused' in LEGS:
        # FUSED leg: ONE XLA program per batch (aug + encode + forward
        # + backward + update via make_fused_train_step) fed by
        # iter_raw over the HBM bank — this is the `fused_input_stage`
        # path the trainer ships; it removes the second per-batch
        # dispatch and the intermediate f32-image + y_true round-trip
        host_step, bank_step = make_fused_train_step(
            model, tx, ANCHORS, NUM_CLASSES, LossConfig(),
            aug_cfg=AUG, donate=True)

        def run_epoch_fused(gen, state):
            t0 = time.time()
            agg = None
            n = 0
            for item in gen.iter_raw():
                if item[0] == 'bank':
                    _, bank, idx, boxes, hw, key = item
                    state, metrics = bank_step(
                        state, bank, jnp.asarray(idx), jnp.asarray(boxes),
                        key)
                else:
                    _, images_u8, boxes, hw, key = item
                    state, metrics = host_step(
                        state, images_u8, jnp.asarray(boxes), key)
                agg = (metrics['loss'] if agg is None
                       else agg + metrics['loss'])
                n += 1
            loss = float(agg) / max(n, 1)
            return state, n, time.time() - t0, loss

        # warm pass compiles AND fills the bank (iter_raw's host path
        # feeds add_batch), so a fused-only run needs no hbm leg first
        state, steps, dt, loss = run_epoch_fused(hbm_gen, state)
        print(f'fused warm epoch: {steps} steps in {dt:.1f}s',
              file=sys.stderr)
        for e in range(EPOCHS):
            state, steps, dt, loss = run_epoch_fused(hbm_gen, state)
            fused_rates.append(steps * BATCH / dt)
            print(f'fused epoch {e + 1}: {steps * BATCH / dt:.1f} img/s '
                  f'({steps} steps, {dt:.1f}s, loss {loss:.3f})',
                  file=sys.stderr)
            assert np.isfinite(loss), loss

    # pure-step leg: identical compiled step on ONE staged batch —
    # isolates what the input pipeline costs on top
    for images, y_true, _ in hbm_gen:
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
    hbm_gen.close()

    out = {
        'metric': f'train_e2e_images_per_sec_{SIDE}_b{BATCH}',
        'pure_step_img_per_s': round(pure, 1),
        'epochs': EPOCHS,
        'steps_per_epoch': steps,
        'loss': round(loss, 4),
    }
    for name, runs in (('e2e', rates), ('hbm', hbm_rates),
                       ('fused', fused_rates)):
        if not runs:
            continue
        med = float(np.median(runs))
        out[f'{name}_img_per_s'] = round(med, 1)
        out[f'{name}_img_per_s_min'] = round(min(runs), 1)
        out[f'{name}_img_per_s_max'] = round(max(runs), 1)
        out[f'{name}_over_pure'] = round(med / pure, 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
