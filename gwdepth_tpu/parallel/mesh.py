"""Device mesh + sharding helpers.

The reference scales with DistributedDataParallel over NCCL
(reference: src/main_glassrgbd.py:46-50, src/util/misc.py:414-436). The TPU
equivalent is a `jax.sharding.Mesh` with the batch sharded over the `data`
axis; gradient averaging falls out of jit's partitioning of the mean loss
(SPMD), so there are no DDP hooks or explicit collectives to manage. A
`model` axis is carried for optional tensor parallelism of large matmuls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,),
              axes: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh; a single -1 entry absorbs the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for every array in a Batch pytree."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_replicated(tree, mesh: Mesh):
    """Put a pytree on the mesh fully replicated BEFORE the first jitted
    step. Without this the first step's output layout differs from its
    input layout and the second call recompiles (~2x compile cost)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
