#!/usr/bin/env python3
"""Decompose the train step's cost on the chip.

Times four jitted programs on the flagship @416 (bf16) to attribute the
training-MFU gap (bench_train: ~0.33 @b32 vs 0.60 inference):

  fwd_eval   — forward, BN in inference mode (running stats)
  fwd_train  — forward, BN in train mode (batch stats + mutation)
  fwd_loss   — fwd_train + MultiGridLoss
  full_step  — value_and_grad + adam update (the production step)

Usage: python tools/profile_train_decompose.py [BATCH] [SIDE] [remat]
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
import optax  # noqa: E402

from multigriddet_tpu.losses import LossConfig, multigrid_loss  # noqa: E402
from multigriddet_tpu.models import create_model  # noqa: E402
from multigriddet_tpu.training.state import TrainState  # noqa: E402
from multigriddet_tpu.training.steps import make_train_step  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
REMAT = sys.argv[3] if len(sys.argv) > 3 else 'none'
HW = (SIDE, SIDE)
NC = 80
PEAK_BF16 = 197e12

ANCHORS = [
    np.array([[112, 74], [149, 190], [370, 328]], np.float32),
    np.array([[28, 17], [56, 112], [57, 35]], np.float32),
    np.array([[9, 10], [13, 28], [28, 55]], np.float32),
]


LOOP = 16


from multigriddet_tpu.utils.profiling import timed_op  # noqa: E402


def timed(fn, *args, repeats=3):
    return timed_op(fn, *args, loop=LOOP, repeats=repeats, with_mfu=True)


def main():
    rng = np.random.RandomState(0)
    remat = {'none': False, 'conv': 'conv', 'full': 'full'}[REMAT]
    model = create_model('multigriddet_darknet', num_classes=NC,
                         dtype=jnp.bfloat16, remat=remat)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False))()
    images = jnp.asarray(rng.rand(BATCH, *HW, 3).astype(np.float32))
    ch = 3 + NC + 5
    y_true = tuple(
        jnp.asarray(rng.rand(BATCH, g, g, ch).astype(np.float32) * 0.01)
        for g in (SIDE // 32, SIDE // 16, SIDE // 8))

    def fwd_eval(images, variables):
        return model.apply(variables, images, train=False)

    def fwd_train(images, variables):
        return model.apply(variables, images, train=True,
                           mutable=['batch_stats'])

    def fwd_loss(images, variables, y_true):
        outs, mut = model.apply(variables, images, train=True,
                                mutable=['batch_stats'])
        total, _ = multigrid_loss(outs, list(y_true), ANCHORS, NC, HW,
                                  LossConfig())
        return total, mut

    tx = optax.adam(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables['params'],
        batch_stats=variables['batch_stats'],
        opt_state=tx.init(variables['params']))
    step = make_train_step(model, tx, ANCHORS, NC, HW, LossConfig(),
                           donate=False)

    rows = [
        ('fwd_eval', *timed(fwd_eval, images, variables)),
        ('fwd_train', *timed(fwd_train, images, variables)),
        ('fwd_loss', *timed(fwd_loss, images, variables, y_true)),
    ]
    # full step timed separately; state threads through so calls form a
    # device-side dependency chain, and the loss is fetched per call
    for _ in range(2):
        state, m = step(state, images, y_true)
        float(m['loss'])
    t0 = time.time()
    losses = []
    for _ in range(8):
        state, m = step(state, images, y_true)
        losses.append(m['loss'])
    _ = [float(l) for l in losses]  # fetch after submitting the chain
    dt = (time.time() - t0) / 8
    flops = None
    try:
        cost = step.lower(state, images, y_true).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
    except Exception:
        pass
    rows.append(('full_step', dt,
                 flops / dt / PEAK_BF16 if flops else float('nan')))

    print(f'batch={BATCH} hw={HW} remat={REMAT}')
    print(f'{"program":<12}{"ms":>10}{"img/s":>10}{"mfu":>8}')
    for name, dt, mfu in rows:
        print(f'{name:<12}{dt * 1e3:>10.2f}{BATCH / dt:>10.1f}{mfu:>8.3f}')


if __name__ == '__main__':
    main()
