"""Multi-host (multi-process) training support.

The TPU pod scaling story: one process per host, each seeing its local
chips; ``jax.distributed.initialize`` wires the coordination service and
``jax.devices()`` becomes the GLOBAL device list.  The same
``NamedSharding`` train/eval steps used single-host then extend unchanged
— each process feeds its local batch shard through
``jax.make_array_from_process_local_data`` and GSPMD's gradient/BN
collectives ride the ICI across the whole slice.

This exceeds the reference, which is single-device (SURVEY.md §2.8: no
tf.distribute/NCCL/MPI anywhere in the tree; multi-GPU is listed as a
"future enhancement", /root/reference/README.md:652).

Config surface (all optional, ``environment.distributed``)::

    environment:
      distributed:
        enabled: auto            # auto | true | false
        coordinator_address: host:port   # omit on TPU pods (auto-detect)
        num_processes: 2                 # omit on TPU pods
        process_id: 0                    # omit on TPU pods

``enabled: auto`` initializes only when coordinator settings are present
in the config or the standard JAX env vars (JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID) — so single-host runs never pay the
coordination-service startup.  On a real TPU pod slice,
``enabled: true`` with no addresses uses JAX's TPU auto-detection.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def maybe_initialize(dist_cfg: Optional[Dict[str, Any]]) -> bool:
    """Initialize jax.distributed from config/env if requested.

    Returns True when running multi-process after the call.  Idempotent:
    a second call (or an externally initialized runtime) is a no-op.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return is_multiprocess()
    cfg = dict(dist_cfg or {})
    enabled = cfg.get('enabled', 'auto')
    coord = cfg.get('coordinator_address',
                    os.environ.get('JAX_COORDINATOR_ADDRESS'))
    nproc = cfg.get('num_processes', os.environ.get('JAX_NUM_PROCESSES'))
    pid = cfg.get('process_id', os.environ.get('JAX_PROCESS_ID'))
    # NOTE: no jax runtime call (process_count/devices) may happen before
    # jax.distributed.initialize — it would initialize the XLA backend
    # single-process and the initialize below would hard-fail.
    if enabled in (False, 'false', 'no'):
        return False
    if enabled == 'auto' and coord is None and nproc is None:
        return False  # nothing configured: stay single-process
    kwargs = {}
    if coord is not None:
        kwargs['coordinator_address'] = str(coord)
    if nproc is not None:
        kwargs['num_processes'] = int(nproc)
    if pid is not None:
        kwargs['process_id'] = int(pid)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return is_multiprocess()


def shard_lines(lines: Sequence[str]) -> List[str]:
    """This process's equal-count shard of the annotation lines.

    Every process must see the SAME number of steps per epoch or the
    collective-bearing train steps deadlock; the tail ``len % nproc``
    lines are dropped (at most nproc-1 per epoch, same discipline as
    batch drop_remainder).
    """
    nproc = jax.process_count()
    if nproc <= 1:
        return list(lines)
    per = len(lines) // nproc
    pid = jax.process_index()
    return list(lines[pid * per:(pid + 1) * per])


def put_global(mesh: Mesh, spec: P, array) -> jax.Array:
    """Build the global batch array from this process's local shard.

    Single-process this is a plain sharded device_put.  Multi-process,
    ``array`` is the process-LOCAL slice of the global batch (dim 0 =
    local_batch = global_batch / process_count) and the result is a
    global jax.Array the jitted steps consume directly.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() <= 1:
        return jax.device_put(array, sharding)
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(array))


def local_batch_size(global_batch: int) -> int:
    """Per-process batch so that process shards concatenate to the
    configured global batch."""
    nproc = jax.process_count()
    if global_batch % max(nproc, 1) != 0:
        raise ValueError(
            f'training.batch_size={global_batch} must divide evenly over '
            f'{nproc} processes')
    return global_batch // max(nproc, 1)


def is_primary() -> bool:
    """True on the process that should write logs/exports (host 0)."""
    return jax.process_index() == 0
