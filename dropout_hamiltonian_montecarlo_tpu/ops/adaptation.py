"""Warmup adaptation: dual-averaging step size + Welford diagonal mass matrix.

The reference implements Hoffman-Gelman dual averaging correctly
(/root/reference/hamiltonian/inference/cpu/hmc.py:141-176) but calls update()
exactly once after burn-in and never applies the result (:94-104), so
adaptation is effectively disabled.  Here adaptation actually runs: one
dual-averaging update per warmup draw inside the scan, the averaged step size
is applied for sampling, and a Welford accumulator estimates a diagonal inverse
mass matrix (a capability the reference lacks entirely — its mass matrix is
hard-coded to identity, cpu/hmc.py:17-26).

Also includes find_reasonable_epsilon (the reference's dead
cpu/find_reasonable_epsilon.py / cpu/hmc.py:122-130, made to work): double or
halve the step size until the one-step acceptance probability crosses 0.5.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .integrators import IntegratorState, velocity_verlet
from .tree import tree_dot

Params = Any


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray        # current log eps
    log_step_avg: jnp.ndarray    # running averaged log eps (the final answer)
    gradient_avg: jnp.ndarray    # H-bar: running avg of (target - accept_prob)
    count: jnp.ndarray           # t
    mu: jnp.ndarray              # shrinkage target log(10*eps0)


def dual_averaging_init(initial_step_size) -> DualAveragingState:
    """Scalar step size -> one DA state; (C,) step sizes -> C independent
    per-chain DA states (all fields broadcast to the step-size shape, so the
    state threads through lax.scan with a chain axis unchanged)."""
    log_eps0 = jnp.log(jnp.asarray(initial_step_size, jnp.float32))
    return DualAveragingState(
        log_step=log_eps0,
        log_step_avg=log_eps0,
        gradient_avg=jnp.zeros_like(log_eps0),
        count=jnp.zeros_like(log_eps0),
        mu=jnp.log(10.0) + log_eps0,
    )


def dual_averaging_update(
    state: DualAveragingState,
    accept_prob,
    target: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    """One Nesterov dual-averaging step (constants match the reference,
    cpu/hmc.py:146-153: target 0.8, gamma 0.05, t0 10, kappa 0.75)."""
    count = state.count + 1.0
    w = 1.0 / (count + t0)
    grad_avg = (1.0 - w) * state.gradient_avg + w * (target - accept_prob)
    log_step = state.mu - (jnp.sqrt(count) / gamma) * grad_avg
    eta = count ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, grad_avg, count, state.mu)


# ---------------------------------------------------------------------------
# Welford running variance -> diagonal inverse mass matrix
# ---------------------------------------------------------------------------


class WelfordState(NamedTuple):
    mean: Params
    m2: Params
    count: jnp.ndarray


def welford_init(position_like: Params) -> WelfordState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, position_like)
    return WelfordState(zeros, jax.tree_util.tree_map(jnp.zeros_like, position_like),
                        jnp.float32(0.0))


def welford_update(state: WelfordState, sample: Params) -> WelfordState:
    count = state.count + 1.0
    delta = jax.tree_util.tree_map(lambda x, m: x - m, sample, state.mean)
    mean = jax.tree_util.tree_map(lambda m, d: m + d / count, state.mean, delta)
    delta2 = jax.tree_util.tree_map(lambda x, m: x - m, sample, mean)
    m2 = jax.tree_util.tree_map(lambda a, d, d2: a + d * d2, state.m2, delta, delta2)
    return WelfordState(mean, m2, count)


def welford_inv_mass(state: WelfordState, regularize: bool = True) -> Params:
    """Posterior-variance estimate as M^-1, Stan-style shrinkage to unit."""
    def var(m2):
        v = m2 / jnp.maximum(state.count - 1.0, 1.0)
        if regularize:
            n = state.count
            v = (n / (n + 5.0)) * v + 1e-3 * (5.0 / (n + 5.0))
        return jnp.maximum(v, 1e-10)
    return jax.tree_util.tree_map(var, state.m2)


# ---------------------------------------------------------------------------
# find_reasonable_epsilon
# ---------------------------------------------------------------------------


def find_reasonable_step_size(
    key,
    logdensity_fn: Callable,
    metric,
    position: Params,
    initial_step_size: float = 1.0,
    max_doublings: int = 30,
) -> jnp.ndarray:
    """Algorithm 4 of Hoffman & Gelman (2014), as a lax.while_loop.

    Repairs the reference's dead implementation (cpu/hmc.py:122-130 references
    an undefined attribute; cpu/find_reasonable_epsilon.py is missing its numpy
    import) with a jit-safe version.
    """
    step_fn = velocity_verlet(logdensity_fn, metric.kinetic_grad)
    value, grad = jax.value_and_grad(logdensity_fn)(position)
    momentum = metric.sample_momentum(key, position)
    state0 = IntegratorState(position, momentum, value, grad)
    h0 = -value + metric.kinetic_energy(momentum)

    def log_accept(eps):
        s = step_fn(state0, eps)
        h1 = -s.logdensity + metric.kinetic_energy(s.momentum)
        delta = h0 - h1
        return jnp.where(jnp.isfinite(delta), delta, -jnp.inf)

    eps0 = jnp.asarray(initial_step_size, jnp.float32)
    # direction: +1 if accept prob already > 0.5 else -1
    direction = jnp.where(log_accept(eps0) > jnp.log(0.5), 1.0, -1.0)

    def cond(carry):
        eps, it = carry
        crossed = direction * log_accept(eps) <= direction * jnp.log(0.5)
        return jnp.logical_and(jnp.logical_not(crossed), it < max_doublings)

    def body(carry):
        eps, it = carry
        return eps * jnp.power(2.0, direction), it + 1

    eps, _ = jax.lax.while_loop(cond, body, (eps0, jnp.int32(0)))
    return eps
