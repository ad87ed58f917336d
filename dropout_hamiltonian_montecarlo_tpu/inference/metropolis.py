"""Random-walk Metropolis-Hastings as a lax.scan kernel.

Capability parity with /root/reference/hamiltonian/inference/cpu/metropolis.py:
Gaussian random-walk proposals with a random per-step log-uniform scale factor
(:53-64), MH accept on the energy difference (:38-50), burn-in acceptance-rate
scale tuning with the PyMC-style bands (:105-128), and multi-chain execution
(reference: Pool.map over chains, :98-103 — here vmap, see sampling.py).

The reference's "sequential single-coordinate update" mode (:58-62) is
supported via ``coordinate_wise=True`` (one randomly-chosen coordinate moves
per step), expressed with a mask instead of host control flow.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp

from ..ops.tree import tree_randn_like, tree_where

Params = Any


class MHState(NamedTuple):
    position: Params
    logdensity: jnp.ndarray


class MHInfo(NamedTuple):
    acceptance_prob: jnp.ndarray
    is_accepted: jnp.ndarray


def init(position: Params, logdensity_fn: Callable) -> MHState:
    return MHState(position, logdensity_fn(position))


def build_kernel(logdensity_fn: Callable, jitter_scale: bool = True,
                 coordinate_wise: bool = False):
    """Returns step(key, state, scale) -> (state, info).

    With jitter_scale=True each step multiplies the proposal scale by
    exp(U(-1,1)) — the reference's random log-uniform scale factor
    (cpu/metropolis.py:53-57) which helps traverse multi-scale targets.

    With coordinate_wise=True each step perturbs exactly ONE uniformly
    chosen coordinate — the reference's sequential single-coordinate update
    mode (cpu/metropolis.py:58-62), expressed as a one-hot mask on the
    flattened parameter vector instead of host control flow.
    """

    def step(key, state: MHState, scale):
        k_scale, k_prop, k_accept, k_coord = jax.random.split(key, 4)
        if jitter_scale:
            factor = jnp.exp(jax.random.uniform(k_scale, minval=-1.0, maxval=1.0))
        else:
            factor = 1.0
        eff_scale = scale * factor

        if coordinate_wise:
            flat, unravel = jax.flatten_util.ravel_pytree(state.position)
            idx = jax.random.randint(k_coord, (), 0, flat.size)
            e = jnp.zeros_like(flat).at[idx].set(
                jax.random.normal(k_prop, dtype=flat.dtype))
            proposal = unravel(flat + eff_scale * e)
        else:
            noise = tree_randn_like(k_prop, state.position)
            proposal = jax.tree_util.tree_map(
                lambda q, e: q + eff_scale * e, state.position, noise
            )
        proposal_logdensity = logdensity_fn(proposal)

        delta = proposal_logdensity - state.logdensity
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(delta))
        accept = jax.random.uniform(k_accept) < accept_prob

        new_state = tree_where(
            accept, MHState(proposal, proposal_logdensity), state
        )
        return MHState(*new_state), MHInfo(accept_prob, accept)

    return step


def tune_scale(scale, acceptance_rate):
    """PyMC-style acceptance-band scale tuning, jit-safe.

    Bands match the reference (cpu/metropolis.py:105-128):
      <0.001: x0.1, <0.05: x0.5, <0.2: x0.9, >0.95: x10, >0.75: x2, >0.5: x1.1
    """
    r = acceptance_rate
    factor = jnp.select(
        [r < 0.001, r < 0.05, r < 0.2, r > 0.95, r > 0.75, r > 0.5],
        [0.1, 0.5, 0.9, 10.0, 2.0, 1.1],
        default=1.0,
    )
    return scale * factor


def run_warmup_scale(kernel, state, key, num_steps: int, initial_scale,
                     tune_interval: int = 100):
    """Burn-in with periodic scale tuning (reference tunes once on the whole
    burn-in acceptance rate, :80-83; we tune every tune_interval steps, which
    strictly dominates).  Returns (state, scale)."""
    num_rounds = max(num_steps // tune_interval, 1)
    keys = jax.random.split(key, num_rounds)

    def round_body(carry, k):
        st, sc = carry
        ks = jax.random.split(k, tune_interval)

        def body(s, kk):
            s, info = kernel(kk, s, sc)
            return s, info.is_accepted

        st, accepts = jax.lax.scan(body, st, ks)
        sc = tune_scale(sc, jnp.mean(accepts.astype(jnp.float32)))
        return (st, sc), None

    (state, scale), _ = jax.lax.scan(
        round_body, (state, jnp.asarray(initial_scale, jnp.float32)), keys
    )
    return state, scale
