"""Train state pytree and parameter partitioning (freeze levels).

The reference freezes Keras layers in place (multigriddet_darknet.py:634-645,
freeze_level 0/1/2).  Functionally we instead label parameters and use
``optax.multi_transform`` to zero updates for frozen subtrees — same
capability, no model surgery, works under jit/shard_map.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # exponential moving average of params (training.ema_decay;
    # beyond-reference).  None when EMA tracking is off — None is an
    # empty pytree, so checkpoints and sharding are unaffected.
    ema_params: Any = None


def freeze_labels(params, freeze_level: int) -> Any:
    """Label each parameter 'trainable' or 'frozen'.

    freeze_level semantics (reference trainer/model builder):
      0: everything trainable
      1: backbone frozen, neck+head trainable
      2: everything frozen except the final predict convs
    """
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        name = '/'.join(str(p) for p in path)
        if freeze_level <= 0:
            labels[path] = 'trainable'
        elif freeze_level == 1:
            labels[path] = ('frozen' if name.startswith('backbone')
                            else 'trainable')
        else:
            labels[path] = ('trainable' if 'PredictConv' in name
                            else 'frozen')
    return flax.traverse_util.unflatten_dict(labels)


def partition_optimizer(optimizer: optax.GradientTransformation,
                        params, freeze_level: int
                        ) -> optax.GradientTransformation:
    """Wrap an optimizer so frozen parameters receive zero updates."""
    if freeze_level <= 0:
        return optimizer
    labels = freeze_labels(params, freeze_level)
    return optax.multi_transform(
        {'trainable': optimizer, 'frozen': optax.set_to_zero()}, labels)


def create_train_state(params, batch_stats,
                       optimizer: optax.GradientTransformation,
                       freeze_level: int = 0) -> TrainState:
    tx = partition_optimizer(optimizer, params, freeze_level)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
