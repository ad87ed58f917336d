"""Sampler driver: run any kernel under lax.scan and collect draws.

Replaces the reference's Python sampling loops with list-append posterior
assembly (/root/reference/hamiltonian/inference/cpu/hmc.py:105-119,
cpu/sgmcmc.py:40-86): here the whole chain is ONE compiled XLA program; draws
land in preallocated device arrays of shape (num_samples, *param_shape).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Any


def run_inference(
    kernel: Callable,
    initial_state,
    key: jax.Array,
    num_samples: int,
    thin: int = 1,
) -> Tuple[Any, Any]:
    """Scan ``kernel(key, state) -> (state, info)`` for num_samples draws.

    Returns (final_state, (stacked_states, stacked_infos)) where stacked arrays
    have a leading draw axis.  With thin > 1 only every thin-th draw is kept
    (inner fori_loop advances without storing).
    """
    keys = jax.random.split(key, num_samples)

    if thin == 1:
        def body(state, k):
            state, info = kernel(k, state)
            return state, (state, info)
    else:
        def body(state, k):
            ks = jax.random.split(k, thin)

            def inner(i, s):
                return kernel(ks[i], s)[0]

            state = jax.lax.fori_loop(0, thin - 1, inner, state)
            state, info = kernel(ks[thin - 1], state)
            return state, (state, info)

    final_state, (states, infos) = jax.lax.scan(body, initial_state, keys)
    return final_state, (states, infos)


def posterior_dict(states, position_attr: str = "position"):
    """Extract the stacked positions pytree from stacked states — the
    reference's ``posterior`` dict-of-(n_samples, \\*shape) return value
    (cpu/hmc.py:107,117-119)."""
    return getattr(states, position_attr)
