"""Device mesh construction for chains x data sharding.

Replaces the reference's process-pool topology (ncores workers,
/root/reference/hamiltonian/inference/cpu/hmc_multicore.py:22-38) with a
jax.sharding.Mesh over ('chains', 'data') axes.  Multi-host: call
jax.distributed.initialize() before building the mesh; XLA lays collectives
over ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_chain_shards: Optional[int] = None,
    num_data_shards: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh(('chains', 'data')) over the available devices.

    Default: all devices on the chains axis (chains are embarrassingly
    parallel — the reference's only parallelism) with data axis 1.  Set
    num_data_shards > 1 to split minibatch gradients (psum) as well.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_chain_shards is None:
        num_chain_shards = n // num_data_shards
    if num_chain_shards * num_data_shards != n:
        raise ValueError(
            f"mesh {num_chain_shards}x{num_data_shards} != {n} devices"
        )
    arr = np.array(devices).reshape(num_chain_shards, num_data_shards)
    return Mesh(arr, ("chains", "data"))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that lays a leading chain axis across the 'chains' mesh axis."""
    return NamedSharding(mesh, P("chains"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
