"""Parallelism layer: device meshes, sharded chains, data-parallel gradients.

The TPU replacement for the reference's L3 (multiprocessing.Pool chains +
producer/consumer Queue minibatch streaming, SURVEY.md §2 parallelism table):
chains shard over a 'chains' mesh axis, minibatch gradients psum over a 'data'
axis, posterior collection is an all_gather — all XLA collectives over ICI/DCN,
no pickling, no queues.
"""

from .mesh import make_mesh, chain_sharding
from .chains import sample_posterior_sharded
from .data import shard_data, data_parallel_logdensity

__all__ = [
    "make_mesh",
    "chain_sharding",
    "sample_posterior_sharded",
    "shard_data",
    "data_parallel_logdensity",
]
