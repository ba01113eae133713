#!/usr/bin/env python3
"""Decompose the e2e training loop's per-batch cost on the real chip.

Measures, at identical config to tools/bench_train_e2e.py (b32 @416,
mosaic+mixup, RAM-warm cache):
  host_load_ms   — HostImageLoader.load_batch from the warm RAM cache
  transfer_ms    — jnp.asarray(u8 batch) + boxes, forced
  stage_ms       — the jitted device aug+encode program, forced
  step_ms        — the jitted train step, forced
  loop_ms        — the actual overlapped generator+step loop per batch
If loop_ms >> max(host, stage+step) the overlap is broken (dispatch
serialization); if loop_ms ~ sum(...) nothing overlaps at all.
"""

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

BATCH, SIDE = 32, 416
HW = (SIDE, SIDE)
NC = 80
N = 512


def timer(fn, reps=8, warm=2):
    for _ in range(warm):
        fn()
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps * 1e3


def main():
    lines = make_dataset('/tmp/bench_train_e2e_ds', N)
    gen = MultiGridDataGenerator(
        lines, ANCHORS, NC, HW, BATCH, max_boxes=100,
        augment={'enabled': True, 'mosaic_prob': 0.3, 'mixup_prob': 0.1},
        train=True, num_workers=8, cache_images=True)

    model = create_model('multigriddet_darknet', num_classes=NC,
                         dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False))()
    tx = optax.adam(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables['params'],
        batch_stats=variables['batch_stats'],
        opt_state=tx.init(variables['params']))
    step = make_train_step(model, tx, ANCHORS, NC, HW, LossConfig(),
                           donate=False)

    # warm epoch: compile + RAM cache
    t0 = time.time()
    for images, y_true, _ in gen:
        st2, metrics = step(state, images, y_true)
    float(metrics['loss'])
    print(f'warm epoch {time.time() - t0:.1f}s')

    batch_lines = gen.lines[:BATCH]
    host_ms = timer(lambda: gen.loader.load_batch(batch_lines, HW))
    print(f'host_load_ms   {host_ms:8.1f}')

    u8, boxes = gen.loader.load_batch(batch_lines, HW)
    tr_ms = timer(lambda: jax.block_until_ready(
        (jnp.asarray(u8), jnp.asarray(boxes))))
    print(f'transfer_ms    {tr_ms:8.1f}')

    def stage():
        im, yt, bx = gen.process_batch(u8, boxes, HW)
        jax.block_until_ready(yt)
        return im, yt

    stage_ms = timer(stage)
    print(f'stage_ms       {stage_ms:8.1f}')

    # stage decomposition: target encoding alone (the lax.scan over the
    # expanded 800-row box list) vs the aug chain (stage - encode)
    from multigriddet_tpu.ops import encode_targets
    big_boxes = np.tile(boxes, (1, 8, 1)).astype(np.float32)  # x8 capacity
    bb = jnp.asarray(big_boxes)

    def encode():
        yt = encode_targets(bb, ANCHORS, NC, HW)
        jax.block_until_ready(yt)

    encode_ms = timer(encode)
    print(f'encode_ms      {encode_ms:8.1f}  (of stage; aug ~ '
          f'{stage_ms - encode_ms:.1f})')

    im, yt, _ = gen.process_batch(u8, boxes, HW)
    jax.block_until_ready(yt)

    def train():
        _, m = step(state, im, yt)
        jax.block_until_ready(m['loss'])

    step_ms = timer(train)
    print(f'step_ms        {step_ms:8.1f}')

    # dispatch-only cost of one full chain (no sync until the end)
    def chain(n=8):
        t0 = time.time()
        s = state
        for _ in range(n):
            imx, ytx, _ = gen.process_batch(u8, boxes, HW)
            s, m = step(s, imx, ytx)
        jax.block_until_ready(m['loss'])
        return (time.time() - t0) / n * 1e3

    chain(2)
    print(f'chain_ms       {chain():8.1f}  (stage+step, dispatch-pipelined)')

    # fused single-program step (aug+encode+fwd+bwd+update, ONE dispatch)
    from multigriddet_tpu.training.steps import make_fused_train_step
    host_step, _ = make_fused_train_step(
        model, tx, ANCHORS, NC, LossConfig(),
        aug_cfg=gen.augment_cfg, donate=False)
    u8d, bxd = jnp.asarray(u8), jnp.asarray(boxes)
    key = jax.random.PRNGKey(0)

    def fused():
        _, m = host_step(state, u8d, bxd, key)
        jax.block_until_ready(m['loss'])

    fused_ms = timer(fused)
    print(f'fused_step_ms  {fused_ms:8.1f}  (vs stage+step '
          f'{stage_ms + step_ms:.1f} synced, chain dispatched)')

    for rep in range(3):
        t0 = time.time()
        nb = 0
        for images, y_true, _ in gen:
            state2, metrics = step(state, images, y_true)
            nb += 1
        jax.block_until_ready(metrics['loss'])
        dt = time.time() - t0
        print(f'loop_ms        {dt / nb * 1e3:8.1f}  '
              f'({nb * BATCH / dt:.1f} img/s)')
    gen.close()


if __name__ == '__main__':
    main()
