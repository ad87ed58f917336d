"""Model-layer golden tests: autodiff gradients vs the reference's closed
forms (the hand-derived grads of /root/reference/hamiltonian/models/*, kept
here as analytic_grad methods) and vs central finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropout_hamiltonian_montecarlo_tpu.models import (
    DropoutMLP,
    Gaussian,
    Logistic,
    MVNGaussian,
    Poisson,
    Softmax,
)
from dropout_hamiltonian_montecarlo_tpu.utils import check_gradient, one_hot


def tree_allclose(a, b, rtol=1e-4, atol=1e-5):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    return all(
        np.allclose(x, y, rtol=rtol, atol=atol) for x, y in zip(flat_a, flat_b)
    )


@pytest.fixture
def key():
    return jax.random.key(0)


def make_classif_data(key, n=64, d=5, k=3):
    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), jnp.float32)
    y = jax.random.randint(ky, (n,), 0, k)
    return X, y


class TestGaussian:
    def test_grad_matches_analytic(self, key):
        m = Gaussian(mu=1.5, sigma=2.0, dim=4)
        params = {"x": jax.random.normal(key, (4,))}
        auto = jax.grad(lambda p: m.log_posterior(p))(params)
        assert tree_allclose(auto, m.analytic_grad(params))


class TestMVN:
    def test_logdensity_matches_scipy_form(self, key):
        cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
        mu = jnp.array([1.0, -1.0])
        m = MVNGaussian(mu, cov)
        x = jax.random.normal(key, (2,))
        expected = jax.scipy.stats.multivariate_normal.logpdf(x, mu, cov)
        got = m.log_posterior({"x": x})
        assert np.allclose(got, expected, rtol=1e-5)

    def test_grad_matches_analytic(self, key):
        cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
        m = MVNGaussian(jnp.zeros(2), cov)
        params = {"x": jax.random.normal(key, (2,))}
        auto = jax.grad(lambda p: m.log_posterior(p))(params)
        assert tree_allclose(auto, m.analytic_grad(params), rtol=1e-4)


class TestLogistic:
    def test_grad_matches_analytic(self, key):
        X, y = make_classif_data(key, k=2)
        y = y.astype(jnp.float32)
        m = Logistic(dim=5, alpha=0.1)
        params = m.init_params(key)
        auto = jax.grad(lambda p: m.log_posterior(p, (X, y)))(params)
        assert tree_allclose(auto, m.analytic_grad(params, (X, y)), rtol=1e-3,
                             )

    def test_gradcheck_finite_difference(self, key):
        X, y = make_classif_data(jax.random.key(3), n=16, d=3, k=2)
        y = y.astype(jnp.float32)
        m = Logistic(dim=3, alpha=0.1)
        params = m.init_params(key)
        check_gradient(lambda p: m.log_posterior(p, (X, y)), params)

    def test_predict_shapes(self, key):
        X, y = make_classif_data(key, k=2)
        m = Logistic(dim=5)
        params = m.init_params(key)
        assert m.predict(params, X).shape == (64,)
        probs = m.predict(params, X, prob=True)
        assert jnp.all((probs >= 0) & (probs <= 1))


class TestSoftmax:
    def test_grad_matches_analytic(self, key):
        X, yi = make_classif_data(key)
        y = one_hot(yi, 3)
        m = Softmax(dim=5, n_classes=3, alpha=0.1)
        params = m.init_params(key)
        auto = jax.grad(lambda p: m.log_posterior(p, (X, y)))(params)
        assert tree_allclose(auto, m.analytic_grad(params, (X, y)), rtol=1e-3)

    def test_minibatch_scaling_consistent(self, key):
        """Value AND grad scale by N/B (the reference scaled only the value,
        cpu/logistic.py:57-62 — we test the consistent estimator)."""
        X, yi = make_classif_data(key, n=32)
        y = one_hot(yi, 3)
        m = Softmax(dim=5, n_classes=3)
        params = m.init_params(key)
        full = m.log_posterior(params, (X, y))
        scaled = m.log_posterior(params, (X[:8], y[:8]), data_size=32)
        # same order of magnitude; exact equality only if batch is representative
        assert np.isfinite(float(full)) and np.isfinite(float(scaled))
        g = jax.grad(lambda p: m.log_posterior(p, (X[:8], y[:8]), data_size=32))(
            params
        )
        g_small = jax.grad(lambda p: m.log_posterior(p, (X[:8], y[:8])))(params)
        # likelihood part of g is 4x that of g_small
        prior = jax.grad(m.log_prior)(params)
        ratio = (g["weights"] - prior["weights"]) / (
            g_small["weights"] - prior["weights"] + 1e-12
        )
        assert np.allclose(ratio, 4.0, rtol=1e-3)

    def test_predict_stochastic_uses_key(self, key):
        X, yi = make_classif_data(key)
        m = Softmax(dim=5, n_classes=3)
        params = m.init_params(key)
        k1, k2 = jax.random.split(key)
        p1 = m.predict_stochastic(params, X, k1, p_drop=0.5, prob=True)
        p2 = m.predict_stochastic(params, X, k2, p_drop=0.5, prob=True)
        assert not np.allclose(p1, p2)
        # same key -> deterministic
        p3 = m.predict_stochastic(params, X, k1, p_drop=0.5, prob=True)
        assert np.allclose(p1, p3)


class TestPoisson:
    def test_grad_matches_analytic(self, key):
        kx, ky = jax.random.split(key)
        X = 0.3 * jax.random.normal(kx, (32, 4), jnp.float32)
        y = jax.random.poisson(ky, 2.0, (32,)).astype(jnp.float32)
        m = Poisson(dim=4, alpha=0.1)
        params = m.init_params(key)
        auto = jax.grad(lambda p: m.log_posterior(p, (X, y)))(params)
        assert tree_allclose(auto, m.analytic_grad(params, (X, y)), rtol=1e-3)


class TestDropoutMLP:
    def test_deterministic_forward_no_key(self, key):
        X = jax.random.normal(key, (8, 6))
        m = DropoutMLP(dim=6, hidden=16, n_classes=4)
        params = m.init_params(key)
        z1 = m.logits(params, X)
        z2 = m.logits(params, X)
        assert np.allclose(z1, z2)

    def test_dropout_forward_keyed(self, key):
        X = jax.random.normal(key, (8, 6))
        m = DropoutMLP(dim=6, hidden=16, n_classes=4, p_drop=0.5)
        params = m.init_params(key)
        k1, k2 = jax.random.split(key)
        za = m.logits(params, X, k1)
        zb = m.logits(params, X, k2)
        assert not np.allclose(za, zb)
        assert np.allclose(za, m.logits(params, X, k1))

    def test_grad_finite(self, key):
        X = jax.random.normal(key, (8, 6))
        y = one_hot(jax.random.randint(key, (8,), 0, 4), 4)
        m = DropoutMLP(dim=6, hidden=16, n_classes=4)
        params = m.init_params(key)
        g = jax.grad(lambda p: m.log_posterior(p, (X, y)))(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(leaf))
