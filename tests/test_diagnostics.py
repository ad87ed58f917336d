"""Diagnostics tests: ESS and split-R-hat behave correctly on synthetic
chains with known autocorrelation structure."""

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.diagnostics import (
    effective_sample_size,
    split_rhat,
    summarize,
)


def ar1_chains(key, chains, draws, rho):
    """AR(1) chains with lag-1 autocorrelation rho; theoretical
    ESS = N * (1-rho)/(1+rho)."""
    eps = jax.random.normal(key, (chains, draws))

    def body(carry, e):
        x = rho * carry + jnp.sqrt(1 - rho**2) * e
        return x, x

    _, xs = jax.lax.scan(body, jnp.zeros(chains), eps.T)
    return xs.T  # (chains, draws)


def test_ess_iid_chains():
    x = jax.random.normal(jax.random.key(0), (4, 1000))
    ess = float(effective_sample_size(x))
    assert 2000 < ess <= 4200, ess


def test_ess_correlated_chains():
    rho = 0.9
    x = ar1_chains(jax.random.key(1), 4, 4000, rho)
    ess = float(effective_sample_size(x))
    expected = 4 * 4000 * (1 - rho) / (1 + rho)  # ~842
    assert 0.4 * expected < ess < 2.0 * expected, (ess, expected)


def test_ess_vectorized_over_params():
    x = jax.random.normal(jax.random.key(2), (2, 500, 3, 4))
    ess = effective_sample_size(x)
    assert ess.shape == (3, 4)
    assert np.all(np.asarray(ess) > 100)


def test_rhat_converged_vs_diverged():
    x = jax.random.normal(jax.random.key(3), (4, 1000))
    r = float(split_rhat(x))
    assert 0.99 < r < 1.05, r
    # shift one chain far away -> R-hat blows up
    x_bad = x.at[0].add(10.0)
    r_bad = float(split_rhat(x_bad))
    assert r_bad > 2.0, r_bad


def test_summarize_pytree():
    positions = {
        "w": jax.random.normal(jax.random.key(4), (2, 300, 5)),
        "b": jax.random.normal(jax.random.key(5), (2, 300)),
    }
    s = summarize(positions, elapsed_seconds=2.0)
    assert "aggregate" in s
    assert float(s["aggregate"]["max_rhat"]) < 1.1
    assert float(s["aggregate"]["min_ess_per_sec"]) > 0
    assert s["w"]["mean"].shape == (5,)
