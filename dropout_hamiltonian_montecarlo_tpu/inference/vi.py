"""Mean-field variational inference (ADVI) baseline.

A north-star addition (BASELINE.json: "a mean-field VI baseline") with no
reference counterpart: Gaussian mean-field q(theta) = N(mu, diag(exp(2*rho))),
reparameterized ELBO gradients, optimized with the same minibatch scan
machinery as the SG-MCMC kernels.  Posterior draws come from q, so the output
plugs into the same predictive/diagnostic utilities as the samplers.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.tree import tree_randn_like

Params = Any
Batch = Tuple[jnp.ndarray, ...]


class MeanFieldState(NamedTuple):
    mu: Params
    rho: Params       # log std-dev, elementwise
    opt_mu: Params    # Adam first moment (mu params)
    opt_rho: Params
    opt2_mu: Params   # Adam second moment
    opt2_rho: Params
    step: jnp.ndarray


def init(position: Params, initial_log_std: float = -3.0) -> MeanFieldState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, position)
    rho = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, initial_log_std), position
    )
    return MeanFieldState(position, rho, zeros, zeros, zeros, zeros,
                          jnp.float32(0.0))


def _gaussian_entropy(rho: Params) -> jnp.ndarray:
    halflog2pie = 0.5 * (1.0 + jnp.log(2.0 * jnp.pi))
    terms = jax.tree_util.tree_map(
        lambda r: jnp.sum(r + halflog2pie), rho
    )
    return jax.tree_util.tree_reduce(jnp.add, terms)


def build_kernel(
    logdensity_fn: Callable[[Params, Batch], jnp.ndarray],
    num_mc_samples: int = 1,
    learning_rate: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """Returns step(key, state, batch, _step_size_unused) -> (state, info).

    ELBO = E_q[log p(theta, data)] + H[q], estimated with num_mc_samples
    reparameterized draws; Adam on (mu, rho).
    """

    def negative_elbo(mu, rho, key, batch):
        def one(k):
            epsilons = tree_randn_like(k, mu)
            theta = jax.tree_util.tree_map(
                lambda m, r, e: m + jnp.exp(r) * e, mu, rho, epsilons
            )
            return logdensity_fn(theta, batch)

        keys = jax.random.split(key, num_mc_samples)
        expected = jnp.mean(jax.vmap(one)(keys))
        return -(expected + _gaussian_entropy(rho))

    def step(key, state: MeanFieldState, batch: Batch, _unused=None):
        loss, (g_mu, g_rho) = jax.value_and_grad(negative_elbo, argnums=(0, 1))(
            state.mu, state.rho, key, batch
        )
        t = state.step + 1.0

        def adam(m, v, g, x):
            m = jax.tree_util.tree_map(lambda a, b: b1 * a + (1 - b1) * b, m, g)
            v = jax.tree_util.tree_map(lambda a, b: b2 * a + (1 - b2) * b * b, v, g)
            mhat = jax.tree_util.tree_map(lambda a: a / (1 - b1**t), m)
            vhat = jax.tree_util.tree_map(lambda a: a / (1 - b2**t), v)
            x = jax.tree_util.tree_map(
                lambda xi, mh, vh: xi - learning_rate * mh / (jnp.sqrt(vh) + eps),
                x, mhat, vhat,
            )
            return m, v, x

        m_mu, v_mu, mu = adam(state.opt_mu, state.opt2_mu, g_mu, state.mu)
        m_rho, v_rho, rho = adam(state.opt_rho, state.opt2_rho, g_rho, state.rho)
        new_state = MeanFieldState(mu, rho, m_mu, m_rho, v_mu, v_rho, t)
        return new_state, loss

    return step


def sample_from(state: MeanFieldState, key: jax.Array, num_samples: int) -> Params:
    """Draw posterior samples from the fitted q — leading axis num_samples."""

    def one(k):
        epsilons = tree_randn_like(k, state.mu)
        return jax.tree_util.tree_map(
            lambda m, r, e: m + jnp.exp(r) * e, state.mu, state.rho, epsilons
        )

    return jax.vmap(one)(jax.random.split(key, num_samples))
