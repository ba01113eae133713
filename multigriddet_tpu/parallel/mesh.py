"""Mesh construction and sharding placement helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = 'batch') -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def make_mesh_2d(dp: int, sp: int,
                 devices: Optional[Sequence] = None,
                 axis_names=('batch', 'space')) -> Mesh:
    """A 2-D mesh for data x spatial partitioning.

    With images sharded ``P('batch', 'space')`` (the H dimension split
    across ``sp`` devices), GSPMD partitions every convolution spatially
    and inserts the halo exchanges — the natural way to scale large-image
    CNN training beyond pure data parallelism on a pod.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= dp * sp, (devices.size, dp, sp)
    return Mesh(devices[:dp * sp].reshape(dp, sp), tuple(axis_names))


def image_partition_spec(mesh: Mesh) -> 'P':
    """P('batch','space') on a 2-D mesh, P('batch') on a 1-D one."""
    if 'space' in mesh.axis_names:
        return P('batch', 'space')
    return P('batch')


def data_parallel_sharding(mesh: Mesh,
                           axis_name: str = 'batch') -> NamedSharding:
    """Sharding that splits dim 0 across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = 'batch'):
    """Place host arrays on the mesh, sharded along dim 0."""
    sharding = data_parallel_sharding(mesh, axis_name)
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
