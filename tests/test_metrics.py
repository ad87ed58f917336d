"""Metric tests: diagonal + Kronecker Gauss-Newton mass matrices are
self-consistent (momentum covariance == M, K(p) and dK/dp agree) and the GN
metric actually isotropizes a GLM posterior."""

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.ops.kron_metric import (
    logistic_gauss_newton_metric,
    softmax_gauss_newton_metric,
)
from dropout_hamiltonian_montecarlo_tpu.ops.metrics import diagonal_metric
from dropout_hamiltonian_montecarlo_tpu.ops.tree import tree_dot


def _autodiff_kinetic_grad(metric, p):
    g = jax.grad(lambda q: metric.kinetic_energy(q))(p)
    return np.asarray(jax.flatten_util.ravel_pytree(g)[0])


def test_diagonal_metric_consistency():
    inv_mass = {"x": jnp.array([0.5, 2.0, 1.0])}
    m = diagonal_metric(inv_mass)
    p = {"x": jnp.array([1.0, -2.0, 3.0])}
    # K = 0.5 p^T M^-1 p
    expected = 0.5 * float(jnp.sum(inv_mass["x"] * p["x"] ** 2))
    assert np.isclose(float(m.kinetic_energy(p)), expected)
    kg = m.kinetic_grad(p)
    assert np.allclose(kg["x"], inv_mass["x"] * p["x"])


def test_softmax_gn_metric_consistency():
    key = jax.random.key(0)
    X = jax.random.normal(key, (50, 6))
    metric = softmax_gauss_newton_metric(np.asarray(X), n_classes=3, alpha=0.7)
    p = {"weights": jax.random.normal(key, (6, 3)),
         "bias": jax.random.normal(jax.random.fold_in(key, 1), (3,))}

    # kinetic grad == d/dp kinetic energy
    kg_flat, _ = jax.flatten_util.ravel_pytree(metric.kinetic_grad(p))
    fd = _autodiff_kinetic_grad(metric, p)
    assert np.allclose(np.asarray(kg_flat), fd, rtol=1e-2, atol=1e-2)

    # momentum covariance matches M: E[K(p)] = dim/2 for p ~ N(0, M)
    keys = jax.random.split(jax.random.key(2), 400)
    ks = jax.vmap(lambda k: metric.kinetic_energy(
        metric.sample_momentum(k, p)))(keys)
    dim = 6 * 3 + 3
    assert abs(float(ks.mean()) - dim / 2) < 0.15 * dim, float(ks.mean())


def test_logistic_gn_metric_consistency():
    key = jax.random.key(0)
    X = jax.random.normal(key, (40, 5))
    metric = logistic_gauss_newton_metric(np.asarray(X), alpha=0.5)
    p = {"weights": jax.random.normal(key, (5,)),
         "bias": jnp.float32(0.3)}
    kg_flat, _ = jax.flatten_util.ravel_pytree(metric.kinetic_grad(p))
    fd = _autodiff_kinetic_grad(metric, p)
    assert np.allclose(np.asarray(kg_flat), fd, rtol=1e-2, atol=1e-2)

    keys = jax.random.split(jax.random.key(2), 400)
    ks = jax.vmap(lambda k: metric.kinetic_energy(
        metric.sample_momentum(k, p)))(keys)
    dim = 6
    assert abs(float(ks.mean()) - dim / 2) < 0.2 * dim


def test_gn_metric_improves_hmc_mixing():
    """HMC with the GN metric on a softmax posterior should accept large steps
    (near-isotropic target) where the unit metric cannot."""
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc
    from dropout_hamiltonian_montecarlo_tpu.models import Softmax
    from dropout_hamiltonian_montecarlo_tpu.utils import one_hot

    key = jax.random.key(0)
    n, d, k = 2000, 8, 3
    X = jax.random.normal(key, (n, d))
    yi = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, k)
    y = one_hot(yi, k)
    model = Softmax(dim=d, n_classes=k, alpha=1.0)
    logdensity = model.make_logdensity(batch=(X, y))
    metric = softmax_gauss_newton_metric(np.asarray(X), k, alpha=1.0)

    kernel = hmc.build_kernel(logdensity, 8, metric=metric)
    state = hmc.init(model.init_params(key), logdensity)
    inv_mass = jax.tree_util.tree_map(jnp.ones_like, state.position)

    accepts = []
    for i in range(20):
        state, info = kernel(jax.random.key(i), state, jnp.float32(0.5),
                             inv_mass)
        accepts.append(float(info.acceptance_prob))
    # unit-metric HMC at eps=0.5 on n=2000 data would reject everything;
    # the GN metric makes eps=0.5 cheap
    assert np.mean(accepts) > 0.5, np.mean(accepts)
