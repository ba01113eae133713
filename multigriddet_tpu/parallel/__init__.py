"""Parallelism layer: device meshes, sharding helpers, collectives.

The reference is single-device (SURVEY.md §2.8: no tf.distribute/NCCL/MPI
anywhere; multi-GPU was a "future enhancement", README.md:652).  Here data
parallelism is first-class: a 1-D ``jax.sharding.Mesh`` with the batch
dimension sharded and parameters replicated.  XLA (GSPMD) inserts the
gradient all-reduces and turns BatchNorm batch-axis reductions into
cross-device collectives that ride the ICI — no hand-written comms layer.

These helpers are re-exported by ``multigriddet_tpu.training``.
"""

from .mesh import (data_parallel_sharding, image_partition_spec,
                   make_mesh, make_mesh_2d, replicate,
                   replicated_sharding, shard_batch)
from .distributed import (is_multiprocess, is_primary, local_batch_size,
                          maybe_initialize, put_global, shard_lines)

__all__ = [
    'data_parallel_sharding', 'image_partition_spec', 'make_mesh',
    'make_mesh_2d', 'replicate',
    'replicated_sharding', 'shard_batch',
    'is_multiprocess', 'is_primary', 'local_batch_size',
    'maybe_initialize', 'put_global', 'shard_lines',
]
