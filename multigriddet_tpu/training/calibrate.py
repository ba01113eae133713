"""BatchNorm statistics recalibration.

With short training runs (or heavy multi-scale/freeze schedules) the BN
running averages (momentum 0.99, the Keras default the reference inherits)
lag the weights, so eval-mode forward passes differ from train-mode ones.
This utility recomputes ``batch_stats`` as the plain average of each
batch's true moments over a sweep of data — the standard production fix —
as one jitted accumulation.

Each EMA update is ``s_new = m * s_old + (1-m) * batch``; starting every
sweep application from zeroed stats gives ``s = (1-m) * batch``, so the
true per-batch moments only need the momentum ``m``.  Models mix momenta
(ConvBN layers default 0.99, the ResNet backbone hardcodes 0.9), so ``m``
is MEASURED per leaf instead of trusted from config: applying the same
batch twice gives ``s2 = (1+m) * s1`` exactly, and a least-squares fit
over the leaf recovers ``m`` regardless of which module owns it.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp


def calibrate_batch_stats(model, params, batch_stats, batches: Iterable,
                          max_batches: int = 32,
                          bn_momentum: float | None = None):
    """Recompute BN running statistics over ``batches`` of images.

    Args:
      model: flax detector module.
      params: parameter pytree.
      batch_stats: existing stats pytree (used as the structure template).
      batches: iterable of image arrays ``[B, H, W, 3]`` float in [0,1]
        (or pipeline tuples whose first element is the image batch).
      max_batches: cap on the number of batches swept.
      bn_momentum: fallback momentum for degenerate leaves the measurement
        cannot fit (all-zero batch moments); the effective momentum of
        every live leaf is measured from the model itself.

    Returns:
      new batch_stats pytree (plain means/variances averaged over batches).
    """
    zeros = jax.tree_util.tree_map(jnp.zeros_like, batch_stats)

    @jax.jit
    def ema_from(stats, images):
        # train-mode BN normalizes with BATCH stats, so zeroed running
        # stats never feed a forward computation — only the EMA update
        _, mut = model.apply(
            {'params': params, 'batch_stats': stats}, images,
            train=True, mutable=['batch_stats'])
        return mut['batch_stats']

    fallback = float(bn_momentum) if bn_momentum else 0.99
    momentum = None
    acc = None
    n = 0
    for item in batches:
        images = item[0] if isinstance(item, (tuple, list)) else item
        s1 = ema_from(zeros, images)            # (1 - m) * batch
        if momentum is None:
            # measure m per leaf once: the same batch twice gives
            # s2 = m*s1 + (1-m)*batch = (1+m)*s1; least-squares over the
            # leaf solves s2 = (1+m)*s1 exactly (same images -> same batch
            # moments)
            s2 = ema_from(s1, images)

            def fit_m(a, b):
                denom = jnp.sum(a * a)
                m = jnp.where(denom > 0, jnp.sum(a * b) / jnp.where(
                    denom > 0, denom, 1.0) - 1.0, fallback)
                return jnp.clip(m, 0.0, 1.0 - 1e-6)

            momentum = jax.tree_util.tree_map(fit_m, s1, s2)
        batch_moments = jax.tree_util.tree_map(
            lambda s, m: s / (1.0 - m), s1, momentum)
        acc = batch_moments if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, batch_moments)
        n += 1
        if n >= max_batches:
            break
    if acc is None:
        return batch_stats
    import flax
    out = jax.tree_util.tree_map(lambda x: x / n, acc)
    # float error can land zero-variance channels (dead ReLUs) slightly
    # negative -> NaN in eval-mode rsqrt.  Clamp the variance leaves.
    flat = flax.traverse_util.flatten_dict(out)
    flat = {k: (jnp.maximum(v, 0.0) if k[-1] == 'var' else v)
            for k, v in flat.items()}
    return flax.traverse_util.unflatten_dict(flat)
