"""HMC end-to-end statistical tests: the reference's hmc_mvn.png criterion
made quantitative (SURVEY.md §4) — sample a known 2-D MVN and check posterior
moments within Monte-Carlo error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropout_hamiltonian_montecarlo_tpu.inference import hmc
from dropout_hamiltonian_montecarlo_tpu.inference.sampling import (
    init_chain_positions,
    sample_posterior,
)
from dropout_hamiltonian_montecarlo_tpu.models import MVNGaussian
from dropout_hamiltonian_montecarlo_tpu.ops.adaptation import (
    dual_averaging_init,
    dual_averaging_update,
    find_reasonable_step_size,
)
from dropout_hamiltonian_montecarlo_tpu.ops.metrics import unit_metric


MU = jnp.array([1.0, -2.0])
COV = jnp.array([[2.0, 0.8], [0.8, 1.0]])


@pytest.fixture(scope="module")
def mvn_posterior():
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = hmc.build_kernel(logdensity, num_integration_steps=16)

    def init_fn(position):
        return hmc.init(position, logdensity)

    key = jax.random.key(42)
    positions = init_chain_positions(model.init_params, key, num_chains=4,
                                     jitter=1.0)
    post = sample_posterior(
        init_fn, kernel, positions, key,
        num_samples=1000, num_warmup=500, num_chains=4,
        initial_step_size=0.5,
    )
    return post


def test_mvn_moments(mvn_posterior):
    x = np.asarray(mvn_posterior.positions["x"])  # (chains, draws, 2)
    flat = x.reshape(-1, 2)
    mean = flat.mean(axis=0)
    cov = np.cov(flat.T)
    # MC error on the mean ~ sqrt(var/ess); be generous (ess >~ 400)
    assert np.allclose(mean, np.asarray(MU), atol=0.25), mean
    assert np.allclose(cov, np.asarray(COV), atol=0.4), cov


def test_acceptance_rate_near_target(mvn_posterior):
    acc = np.asarray(mvn_posterior.infos.acceptance_prob)
    assert 0.6 < acc.mean() < 0.99, acc.mean()


def test_no_divergences(mvn_posterior):
    assert np.asarray(mvn_posterior.infos.is_divergent).mean() < 0.01


def test_adapted_step_size_positive(mvn_posterior):
    ss = np.asarray(mvn_posterior.step_size)
    assert np.all(ss > 0) and np.all(np.isfinite(ss))


def test_reproducible_same_key():
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = hmc.build_kernel(logdensity, num_integration_steps=8)
    state = hmc.init({"x": jnp.zeros(2)}, logdensity)
    key = jax.random.key(7)
    inv_mass = {"x": jnp.ones(2)}
    s1, _ = kernel(key, state, jnp.float32(0.3), inv_mass)
    s2, _ = kernel(key, state, jnp.float32(0.3), inv_mass)
    assert np.allclose(s1.position["x"], s2.position["x"])


def test_dual_averaging_converges_to_target():
    """Feed synthetic acceptance probs that increase as step size shrinks;
    DA should settle near the crossover — the reference's class (cpu/hmc.py:
    141-176) implements this math but never runs it; ours runs."""
    da = dual_averaging_init(1.0)
    for _ in range(200):
        eps = float(jnp.exp(da.log_step))
        accept = 1.0 / (1.0 + eps)  # accept=0.8 at eps=0.25
        da = dual_averaging_update(da, accept, target=0.8)
    eps_final = float(jnp.exp(da.log_step_avg))
    assert 0.15 < eps_final < 0.4, eps_final


def test_find_reasonable_step_size():
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    metric = unit_metric({"x": jnp.zeros(2)})
    eps = find_reasonable_step_size(
        jax.random.key(0), logdensity, metric, {"x": jnp.zeros(2)},
        initial_step_size=1e-6,
    )
    assert 1e-4 < float(eps) < 10.0, float(eps)


def test_jittered_steps_vary():
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = hmc.build_kernel(logdensity, num_integration_steps=32,
                              jitter_steps=True)
    state = hmc.init({"x": jnp.zeros(2)}, logdensity)
    inv_mass = {"x": jnp.ones(2)}
    ns = []
    for i in range(10):
        _, info = kernel(jax.random.key(i), state, jnp.float32(0.1), inv_mass)
        ns.append(int(info.num_integration_steps))
    assert len(set(ns)) > 1, ns
    assert all(1 <= n <= 32 for n in ns)
