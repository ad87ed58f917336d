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


def test_ece_perfectly_calibrated_vs_overconfident():
    """A predictor whose confidence equals its empirical accuracy has ~0 ECE;
    an overconfident one has ECE ~= conf - acc."""
    from dropout_hamiltonian_montecarlo_tpu.diagnostics import (
        expected_calibration_error,
    )

    rng = np.random.RandomState(0)
    n, k = 20000, 2
    # binary predictor, always 70% confident in class 0
    probs = np.tile(np.array([[0.7, 0.3]], np.float32), (n, 1))
    # ...and correct exactly 70% of the time -> calibrated
    labels_cal = (rng.rand(n) > 0.7).astype(np.int32)
    ece_cal = float(expected_calibration_error(jnp.asarray(probs),
                                               jnp.asarray(labels_cal)))
    assert ece_cal < 0.02, ece_cal
    # ...but correct only 50% of the time -> ECE ~ 0.2
    labels_bad = (rng.rand(n) > 0.5).astype(np.int32)
    ece_bad = float(expected_calibration_error(jnp.asarray(probs),
                                               jnp.asarray(labels_bad)))
    assert 0.15 < ece_bad < 0.25, ece_bad


def test_posterior_predictive_probs_shape_and_mean():
    from dropout_hamiltonian_montecarlo_tpu.diagnostics import (
        posterior_predictive_probs,
    )
    from dropout_hamiltonian_montecarlo_tpu.models import Softmax

    model = Softmax(dim=3, n_classes=4, alpha=1.0)
    X = jnp.asarray(np.random.RandomState(1).randn(10, 3), jnp.float32)
    draws = {
        "weights": jnp.zeros((2, 8, 3, 4)),   # (chains, draws, D, K)
        "bias": jnp.zeros((2, 8, 4)),
    }
    probs = posterior_predictive_probs(
        lambda p, x: model.predict(p, x, prob=True), draws, X, max_draws=4)
    assert probs.shape == (10, 4)
    np.testing.assert_allclose(np.asarray(probs), 0.25, atol=1e-6)


def test_blocked_ess_matches_unblocked():
    from dropout_hamiltonian_montecarlo_tpu.diagnostics.ess import (
        effective_sample_size,
    )

    x = jax.random.normal(jax.random.key(0), (4, 200, 37))
    a = np.asarray(effective_sample_size(x))
    b = np.asarray(effective_sample_size(x, block_size=8))  # ragged blocks
    np.testing.assert_allclose(a, b, rtol=1e-5)
