"""Pytree arithmetic for sampler kernels.

The reference carries parameters as a flat ``dict[str, ndarray]`` and loops over
its keys in Python inside the leapfrog integrator
(/root/reference/hamiltonian/inference/cpu/hmc.py:49-54).  Here parameters are
arbitrary JAX pytrees and every operation below is a fused elementwise XLA
program over all leaves at once — no per-variable Python loop survives tracing.
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp


def tree_add(a, b):
    """a + b, leafwise."""
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a, b):
    """a - b, leafwise."""
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(a, s):
    """s * a for scalar s, leafwise."""
    return jax.tree_util.tree_map(lambda x: s * x, a)


def tree_mul(a, b):
    """a * b, leafwise (Hadamard)."""
    return jax.tree_util.tree_map(jnp.multiply, a, b)


def tree_axpy(s, x, y):
    """y + s * x, leafwise (the leapfrog update primitive)."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + s * xi, x, y)


def tree_dot(a, b):
    """Full inner product sum_i a_i b_i over all leaves (float32 scalar)."""
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_ones_like(a):
    return jax.tree_util.tree_map(jnp.ones_like, a)


def tree_randn_like(key, a):
    """Standard-normal pytree with the structure/shape/dtype of ``a``.

    Replaces the reference's per-variable dict loop of ``rng.normal`` draws
    (/root/reference/hamiltonian/inference/cpu/hmc.py:82-87) with split keys —
    deterministic per (key, leaf) and vmap-safe.
    """
    leaves, treedef = jax.tree_util.tree_flatten(a)
    keys = jax.random.split(key, len(leaves))
    new_leaves = [
        jax.random.normal(k, leaf.shape, leaf.dtype) for k, leaf in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def tree_size(a):
    """Total number of scalar parameters in the pytree."""
    return sum(leaf.size for leaf in jax.tree_util.tree_leaves(a))


def tree_ravel(a):
    """Flatten a pytree to a single 1-D vector; returns (vector, unravel_fn)."""
    return jax.flatten_util.ravel_pytree(a)


def tree_where(pred, a, b):
    """Leafwise select: pred ? a : b (pred is a scalar bool)."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _bcast(v, leaf):
    """Reshape a (C,)-vector so it broadcasts against a (C, ...) leaf."""
    v = jnp.asarray(v)
    return v.reshape(v.shape + (1,) * (leaf.ndim - v.ndim))


def tree_axpy_bcast(s, x, y):
    """y + s * x where s is a per-chain (C,) vector and leaves carry a leading
    chain axis (the chain-batched leapfrog update primitive)."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + _bcast(s, xi) * xi, x, y)


def tree_where_bcast(pred, a, b):
    """Leafwise select with a per-chain (C,) bool pred over (C, ...) leaves."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(_bcast(pred, x), x, y), a, b
    )


def tree_batch_ravel(a):
    """Chain-batched pytree (leaves (C, ...)) -> ((C, D) matrix, unravel).

    The batched analogue of jax.flatten_util.ravel_pytree: one reshape +
    concat per leaf, no per-chain vmap (XLA lowers it to a single layout
    copy).  ``unravel`` maps any (C', D) matrix back to the pytree structure
    with leading axis C'."""
    import math

    leaves, treedef = jax.tree_util.tree_flatten(a)
    shapes = [leaf.shape[1:] for leaf in leaves]
    sizes = [math.prod(s) for s in shapes]
    mat = jnp.concatenate(
        [leaf.reshape(leaf.shape[0], -1) for leaf in leaves], axis=1
    )

    def unravel(z):
        out, off = [], 0
        for s, sz in zip(shapes, sizes):
            out.append(z[:, off:off + sz].reshape((z.shape[0],) + s))
            off += sz
        return jax.tree_util.tree_unflatten(treedef, out)

    return mat, unravel


def tree_batched_dot(a, b):
    """Per-chain inner product over (C, ...) leaves -> (C,) vector."""
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(
            (x * y).reshape(x.shape[0], -1), axis=1
        ),
        a, b,
    )
    return jax.tree_util.tree_reduce(jnp.add, leaves)
