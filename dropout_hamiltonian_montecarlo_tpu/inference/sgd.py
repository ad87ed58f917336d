"""Momentum SGD with input-feature dropout — the MAP/baseline optimizer.

Capability parity with /root/reference/hamiltonian/inference/cpu/sgd.py and
gpu/sgd.py: classical momentum m = gamma*m - eps*grad(NLP); theta += m
(:25-45), and ``fit_dropout`` (:47-66) which samples a Bernoulli(p) mask over
the *input feature matrix* each minibatch (X * Z elementwise) — the "dropout"
of the repo title.  Expressed as one lax.scan; the loss trace is the
per-minibatch negative log likelihood like the reference's per-epoch trace
(:67).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.tree import tree_zeros_like

Params = Any
Batch = Tuple[jnp.ndarray, ...]


class SGDState(NamedTuple):
    position: Params
    momentum: Params


def sgd_init(position: Params) -> SGDState:
    return SGDState(position, tree_zeros_like(position))


def build_sgd_kernel(
    logdensity_fn: Callable[[Params, Batch], jnp.ndarray],
    gamma: float = 0.9,
    dropout_rate: float = 0.0,
):
    """Returns step(key, state, batch, step_size) -> (state, loss).

    With dropout_rate > 0, a fresh Bernoulli(1 - dropout_rate) mask is applied
    to the batch inputs each step (reference keep-prob semantics: its ``p`` is
    the Binomial keep probability, cpu/sgd.py:61-62).  Maximizes logdensity
    (= minimizes the reference's negative log posterior).
    """

    def step(key, state: SGDState, batch: Batch, step_size):
        X = batch[0]
        if dropout_rate > 0.0:
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(key, keep, X.shape).astype(X.dtype)
            batch = (X * mask,) + tuple(batch[1:])
        value, grad = jax.value_and_grad(logdensity_fn)(state.position, batch)
        momentum = jax.tree_util.tree_map(
            lambda m, g: gamma * m + step_size * g, state.momentum, grad
        )
        position = jax.tree_util.tree_map(
            lambda q, m: q + m, state.position, momentum
        )
        return SGDState(position, momentum), -value

    return step


def fit(
    kernel: Callable,
    initial_state: SGDState,
    key: jax.Array,
    data: Batch,
    batch_size: int,
    num_steps: int,
    step_size: float,
) -> Tuple[SGDState, jnp.ndarray]:
    """Scan the SGD kernel over random minibatches; returns (state, losses)."""
    n_data = data[0].shape[0]
    keys = jax.random.split(key, num_steps)
    eps = jnp.float32(step_size)

    def body(state, k):
        k_batch, k_step = jax.random.split(k)
        idx = jax.random.randint(k_batch, (batch_size,), 0, n_data)
        batch = tuple(d[idx] for d in data)
        state, loss = kernel(k_step, state, batch, eps)
        return state, loss

    return jax.lax.scan(body, initial_state, keys)
