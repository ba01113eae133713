"""Orbax checkpointing: params + batch_stats + opt_state + step.

Upgrades the reference's weights-only HDF5 ModelCheckpoint
(trainers/trainer.py:350-370; "optimizer state is not restored" —
SURVEY.md §5) to true exact resume: the full TrainState round-trips, so a
resumed run continues bit-for-bit (modulo data order).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with best-metric tracking."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 monitor: str = 'val_loss', mode: str = 'min',
                 save_best_only: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_best_only = save_best_only
        best_fn = (lambda m: -m[monitor]) if mode == 'min' else \
            (lambda m: m[monitor])
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=best_fn if save_best_only else None,
            enable_async_checkpointing=False)
        self._mngr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState,
             metrics: Optional[dict] = None):
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mngr.save(step, args=ocp.args.StandardSave(state),
                        metrics=metrics or None)
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f'no checkpoint found in {self.directory}')
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_template)
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mngr.close()


def save_params(path: str, params: Any):
    """Standalone parameter export (msgpack via flax serialization)."""
    from flax import serialization
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Any) -> Any:
    from flax import serialization
    with open(path, 'rb') as f:
        return serialization.from_bytes(template, f.read())
