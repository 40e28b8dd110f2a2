"""Device-mesh helpers for sharded indexes.

The reference is single-host shared-memory (SURVEY §2.2); its scale axis is
"dataset larger than RAM" solved by LMDB paging. The TPU equivalent is
"vector store larger than one chip's HBM" solved by sharding slots across
an ICI mesh (BASELINE.json north star): every chip owns an equal slice of
the vectors + adjacency, queries fan out via ``shard_map`` and merge with
XLA collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None, axis: str = SHARD_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_leading(mesh: Mesh, axis: str = SHARD_AXIS) -> NamedSharding:
    """Shard an array's leading dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
