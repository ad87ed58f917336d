"""Data-parallel gradients: shard the batch, psum the gradient.

The TPU replacement for the reference's producer/consumer Queue minibatch
pipeline (/root/reference/hamiltonian/inference/cpu/sgld_multicore.py:73-97):
the dataset is laid out across the 'data' mesh axis once (one device_put), and
every minibatch gradient is a local gather + matmul followed by a psum over
ICI — no host round-trips, no pickling.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any
Batch = Tuple[jnp.ndarray, ...]


def shard_data(data: Batch, mesh: Mesh, axis: str = "data") -> Batch:
    """Lay the leading (example) axis of every array across the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(d, sharding) for d in data)


def data_parallel_logdensity(
    logdensity_fn: Callable[[Params, Batch], jnp.ndarray],
    axis: str = "data",
) -> Callable[[Params, Batch], jnp.ndarray]:
    """Wrap a minibatch log density for use INSIDE shard_map over ``axis``.

    The wrapped callable sees the local batch shard and psums the scalar
    log-likelihood contribution over the data axis, so jax.grad of it psums
    the gradient automatically (grad-of-psum = psum-of-grad).  Priors are
    counted once: the inner fn must be written as prior + likelihood and the
    prior term is divided by the axis size before the psum.
    """

    def wrapped(params: Params, local_batch: Batch) -> jnp.ndarray:
        n_shards = jax.lax.axis_size(axis)
        # logdensity = prior + ll_local on every shard; we want
        # prior + sum_shards ll_local = psum(logdensity - prior*(1-1/n)).
        # Implemented as: psum(logdensity)/1 - (n-1)*prior requires the prior
        # separately; instead require the caller to pass a fn of the form
        # prior/n_shards + ll (see make_sharded_logdensity below).
        return jax.lax.psum(logdensity_fn(params, local_batch), axis)

    return wrapped


def make_sharded_logdensity(model, data_size: int, axis: str = "data"):
    """Minibatch log density safe for data-parallel shard_map: the prior is
    scaled by 1/axis_size so that the psum over shards counts it exactly once,
    and the likelihood scale uses the GLOBAL batch size (local * n_shards)."""

    def logdensity(params, local_batch):
        n_shards = jax.lax.axis_size(axis)
        local_bs = local_batch[0].shape[0]
        global_bs = local_bs * n_shards
        ll = model.log_likelihood(params, local_batch)
        ll = (data_size / global_bs) * ll
        contribution = model.log_prior(params) / n_shards + ll
        return jax.lax.psum(contribution, axis)

    return logdensity
