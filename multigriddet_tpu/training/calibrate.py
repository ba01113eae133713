"""BatchNorm statistics recalibration.

With short training runs (or heavy multi-scale/freeze schedules) the BN
running averages (momentum 0.99, the Keras default the reference inherits)
lag the weights, so eval-mode forward passes differ from train-mode ones.
This utility recomputes ``batch_stats`` as the average over a sweep of
data — the standard production fix — as one jitted accumulation.
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
      bn_momentum: the momentum the model's BN layers were built with.
        When given, the momentum EMA is inverted exactly —
        ``batch = (mutated - m*old) / (1-m)`` — so each sweep batch
        contributes its true moments regardless of momentum.

    Returns:
      new batch_stats pytree (plain means/variances averaged over batches).
    """

    @jax.jit
    def stats_of(params, images):
        _, mut = model.apply(
            {'params': params, 'batch_stats': batch_stats}, images,
            train=True, mutable=['batch_stats'])
        new = mut['batch_stats']
        if bn_momentum:
            m = bn_momentum
            new = jax.tree_util.tree_map(
                lambda s_new, s_old: (s_new - m * s_old) / (1.0 - m),
                new, batch_stats)
            # the 1/(1-m) inversion amplifies float error; zero-variance
            # channels (dead ReLUs) can land slightly negative -> NaN in
            # eval-mode rsqrt.  Clamp the variance leaves.
            import flax
            flat = flax.traverse_util.flatten_dict(new)
            flat = {k: (jnp.maximum(v, 0.0) if k[-1] == 'var' else v)
                    for k, v in flat.items()}
            new = flax.traverse_util.unflatten_dict(flat)
        return new

    acc = None
    n = 0
    for item in batches:
        images = item[0] if isinstance(item, (tuple, list)) else item
        s = stats_of(params, images)
        acc = s if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, s)
        n += 1
        if n >= max_batches:
            break
    if acc is None:
        return batch_stats
    return jax.tree_util.tree_map(lambda x: x / n, acc)
