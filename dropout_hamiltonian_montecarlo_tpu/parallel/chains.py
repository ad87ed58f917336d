"""Sharded multi-chain sampling: vmap inside, shard_map over the chain axis.

The reference's chain parallelism is Pool.map over pickled sampler copies with
per-worker seeds and host-side posterior concatenation
(/root/reference/hamiltonian/inference/cpu/hmc_multicore.py:22-38).  Here the
vmapped chain batch is sharded across the 'chains' mesh axis with shard_map:
each device runs its chain block inside one XLA program; the stacked posterior
comes back as a global array laid out across devices (collection = the output
sharding, no explicit gather needed; cross-chain diagnostics reduce with
jnp ops over the global array).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference.sampling import Posterior, sample_posterior

Params = Any


def sample_posterior_sharded(
    init_fn: Callable,
    kernel: Callable,
    initial_positions: Params,   # leading chain axis, divisible by mesh chains
    key: jax.Array,
    mesh: Mesh,
    num_samples: int,
    num_warmup: int = 500,
    num_chains: int = 1,
    **kwargs,
) -> Posterior:
    """Like sampling.sample_posterior but with the chain axis sharded over
    mesh axis 'chains'.  Per-shard PRNG keys derive from the shard index, so
    results are reproducible for a fixed (key, mesh shape)."""
    n_shards = mesh.shape["chains"]
    if num_chains % n_shards != 0:
        raise ValueError(f"num_chains {num_chains} % shards {n_shards} != 0")
    chains_per_shard = num_chains // n_shards

    def shard_fn(positions_block):
        # distinct key per shard: fold in the shard's position on the mesh
        idx = jax.lax.axis_index("chains")
        shard_key = jax.random.fold_in(key, idx)
        return sample_posterior(
            init_fn, kernel, positions_block, shard_key,
            num_samples=num_samples, num_warmup=num_warmup,
            num_chains=chains_per_shard, **kwargs,
        )

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P("chains"),
        out_specs=P("chains"),
        check_vma=False,
    )
    return sharded(initial_positions)
