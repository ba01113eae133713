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
                step: Optional[int] = None,
                allow_mismatch: bool = False) -> TrainState:
        """Restore the full TrainState.

        With ``allow_mismatch``, a checkpoint whose opt_state tree does not
        match the template (saved on the other side of a freeze-stage
        boundary, where optax.multi_transform changes the tree structure)
        falls back to restoring params/batch_stats/step onto the template's
        fresh optimizer state — the same optimizer an unresumed run would
        create at that boundary.
        """
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f'no checkpoint found in {self.directory}')
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_template)
        try:
            return self._mngr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        except Exception:
            if not allow_mismatch:
                raise
            raw = self.restore_raw(step)
            print('Checkpoint optimizer state does not match this training '
                  'stage (saved across a freeze boundary); restored '
                  'params/batch_stats/step with a fresh optimizer state')
            import jax.numpy as jnp
            restored = state_template.replace(
                step=jnp.asarray(raw['step'], jnp.int32),
                params=raw['params'],
                batch_stats=raw['batch_stats'])
            if (state_template.ema_params is not None
                    and raw.get('ema_params') is not None):
                restored = restored.replace(ema_params=raw['ema_params'])
            return restored

    def restore_raw(self, step: Optional[int] = None):
        """Restore the checkpoint as a raw pytree (no template)."""
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f'no checkpoint found in {self.directory}')
        return self._mngr.restore(step)

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


def load_weights_flexible(path: str, params_template: Any,
                          batch_stats_template: Any = None):
    """Load a weights file that is EITHER a params-only tree or a
    ``{'params', 'batch_stats'}`` bundle (the trainer's
    ``final_model.msgpack`` / serving format).

    flax's ``from_bytes`` is template-strict, so a fine-tune pointed at
    an exported bundle (or an engine pointed at a bare params dump)
    would otherwise fail with a key-mismatch.  Returns
    ``(params, batch_stats)``; ``batch_stats`` is the template when the
    file carries none.
    """
    from flax import serialization
    with open(path, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and 'params' in raw:
        params = serialization.from_state_dict(params_template,
                                               raw['params'])
        batch_stats = batch_stats_template
        if batch_stats_template is not None and raw.get('batch_stats'):
            batch_stats = serialization.from_state_dict(
                batch_stats_template, raw['batch_stats'])
        return params, batch_stats
    return (serialization.from_state_dict(params_template, raw),
            batch_stats_template)


def load_backbone_flexible(path: str, backbone_params_template: Any,
                           backbone_stats_template: Any = None):
    """Load ONLY the backbone subtree from a weights file that may be a
    bare backbone-params tree, a full params tree, or a full
    ``{'params', 'batch_stats'}`` bundle (transfer learning —
    reference trainer.py:312-319 loads backbone h5s by name).

    Returns ``(backbone_params, backbone_batch_stats)``.
    """
    from flax import serialization
    with open(path, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    raw_stats = None
    if isinstance(raw, dict) and 'params' in raw:
        raw_stats = (raw.get('batch_stats') or {})
        raw = raw['params']
    if isinstance(raw, dict) and 'backbone' in raw:
        raw_stats = (raw_stats or {}).get('backbone') \
            if raw_stats is not None else None
        raw = raw['backbone']
    params = serialization.from_state_dict(backbone_params_template, raw)
    stats = backbone_stats_template
    if backbone_stats_template is not None and raw_stats:
        stats = serialization.from_state_dict(backbone_stats_template,
                                              raw_stats)
    return params, stats
