"""Stan-style window adaptation for HMC/NUTS, as a single lax.scan.

The reference's burn-in does no adaptation at all (dual averaging constructed
but unused — /root/reference/hamiltonian/inference/cpu/hmc.py:94-104) and has
no mass matrix.  This module implements the standard three-phase schedule:

  [ fast: DA only | middle: DA + Welford windows (doubling) | fast: DA only ]

The schedule is precomputed host-side as per-step flag arrays and scanned over,
so the whole warmup is one compiled program.  At the end of each middle window
the diagonal inverse mass matrix is refreshed from the Welford accumulator, the
accumulator resets, and dual averaging restarts from the current averaged step
size (matching Stan's behavior).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.adaptation import (
    DualAveragingState,
    WelfordState,
    dual_averaging_init,
    dual_averaging_update,
    welford_init,
    welford_inv_mass,
    welford_update,
)
from ..ops.tree import tree_ones_like

Params = Any


def build_schedule(num_steps: int, init_buffer: int = 75, term_buffer: int = 50,
                   first_window: int = 25):
    """(is_middle, window_end) boolean arrays of length num_steps."""
    num_steps = int(num_steps)
    if num_steps < 20:
        return (np.zeros(num_steps, bool), np.zeros(num_steps, bool))
    # shrink buffers for short warmups, as Stan does
    if init_buffer + term_buffer + first_window > num_steps:
        frac = num_steps / (init_buffer + term_buffer + first_window)
        init_buffer = int(init_buffer * frac)
        term_buffer = int(term_buffer * frac)
        first_window = max(num_steps - init_buffer - term_buffer, 1)

    is_middle = np.zeros(num_steps, bool)
    window_end = np.zeros(num_steps, bool)
    is_middle[init_buffer : num_steps - term_buffer] = True

    # doubling windows inside the middle phase
    pos = init_buffer
    size = first_window
    while pos < num_steps - term_buffer:
        end = pos + size
        if end + 2 * size > num_steps - term_buffer:
            end = num_steps - term_buffer
        window_end[min(end, num_steps) - 1] = True
        pos = end
        size *= 2
    return is_middle, window_end


class WarmupResult(NamedTuple):
    state: Any                 # final sampler state
    step_size: jnp.ndarray     # adapted step size
    inv_mass: Params           # adapted diagonal inverse mass
    info: Any                  # per-step warmup info (acceptance, step sizes)


def run_warmup(
    kernel: Callable,            # (key, state, step_size, inv_mass) -> (state, info)
    initial_state,
    key: jax.Array,
    num_steps: int,
    initial_step_size: float = 0.1,
    target_acceptance: float = 0.8,
    initial_inv_mass: Optional[Params] = None,
    adapt_mass: bool = True,
) -> WarmupResult:
    """adapt_mass=False: dual averaging only, inv_mass stays at its initial
    value — the right choice when the target is already preconditioned (e.g.
    whitened by a Gauss-Newton metric): Welford variance estimates from short,
    not-yet-mixed windows are noisier than the known ~unit scale and drag the
    step size down."""
    position_like = initial_state.position
    if initial_inv_mass is None:
        initial_inv_mass = tree_ones_like(position_like)

    if adapt_mass:
        is_middle, window_end = build_schedule(num_steps)
    else:
        is_middle = np.zeros(num_steps, bool)
        window_end = np.zeros(num_steps, bool)
    is_middle = jnp.asarray(is_middle)
    window_end = jnp.asarray(window_end)

    da0 = dual_averaging_init(initial_step_size)
    wf0 = welford_init(position_like)
    keys = jax.random.split(key, num_steps)

    def body(carry, xs):
        state, da, wf, inv_mass = carry
        k, middle, wend = xs

        step_size = jnp.exp(da.log_step)
        state, info = kernel(k, state, step_size, inv_mass)
        da = dual_averaging_update(da, info.acceptance_prob, target_acceptance)

        # accumulate posterior variance during middle windows
        wf_new = welford_update(wf, state.position)
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(middle, a, b), wf_new, wf
        )

        # refresh mass matrix + restart DA + reset Welford at window ends
        new_inv_mass = welford_inv_mass(wf)
        inv_mass = jax.tree_util.tree_map(
            lambda n, o: jnp.where(wend, n, o), new_inv_mass, inv_mass
        )
        da_restart = dual_averaging_init(jnp.exp(da.log_step_avg))
        da_restart = da_restart._replace(
            mu=jnp.log(10.0) + da.log_step_avg, log_step=da.log_step_avg
        )
        da = jax.tree_util.tree_map(
            lambda r, c: jnp.where(wend, r, c), da_restart, da
        )
        wf_reset = welford_init(position_like)
        wf = jax.tree_util.tree_map(
            lambda r, c: jnp.where(wend, r, c), wf_reset, wf
        )

        return (state, da, wf, inv_mass), (info, step_size)

    (state, da, _, inv_mass), (infos, step_sizes) = jax.lax.scan(
        body, (initial_state, da0, wf0, initial_inv_mass),
        (keys, is_middle, window_end),
    )
    return WarmupResult(state, jnp.exp(da.log_step_avg), inv_mass,
                        (infos, step_sizes))
