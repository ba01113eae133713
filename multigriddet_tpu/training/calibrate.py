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
                          max_batches: int = 32):
    """Recompute BN running statistics over ``batches`` of images.

    Args:
      model: flax detector module.
      params: parameter pytree.
      batch_stats: existing stats pytree (used as the structure template).
      batches: iterable of image arrays ``[B, H, W, 3]`` float in [0,1]
        (or pipeline tuples whose first element is the image batch).
      max_batches: cap on the number of batches swept.

    Returns:
      new batch_stats pytree (plain means/variances averaged over batches).
    """

    # NOTE: `model` should be built with ``bn_momentum=0.0`` (the factories
    # expose the knob) so the mutated stats are exactly each batch's
    # moments; with a non-zero momentum this still improves stats but
    # converges more slowly.
    @jax.jit
    def stats_of(params, images):
        _, mut = model.apply(
            {'params': params, 'batch_stats': batch_stats}, images,
            train=True, mutable=['batch_stats'])
        return mut['batch_stats']

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
