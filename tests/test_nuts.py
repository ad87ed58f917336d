"""NUTS statistical tests: correct MVN moments, adaptive trajectory lengths,
composition with window adaptation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropout_hamiltonian_montecarlo_tpu.inference import nuts
from dropout_hamiltonian_montecarlo_tpu.inference.sampling import (
    init_chain_positions,
    sample_posterior,
)
from dropout_hamiltonian_montecarlo_tpu.models import MVNGaussian

MU = jnp.array([1.0, -2.0])
COV = jnp.array([[2.0, 0.8], [0.8, 1.0]])


@pytest.fixture(scope="module")
def nuts_posterior():
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = nuts.build_kernel(logdensity, max_tree_depth=8)

    def init_fn(p):
        return nuts.init(p, logdensity)

    key = jax.random.key(0)
    positions = init_chain_positions(model.init_params, key, num_chains=4,
                                     jitter=1.0)
    return sample_posterior(
        init_fn, kernel, positions, key,
        num_samples=500, num_warmup=300, num_chains=4,
        initial_step_size=0.5,
    )


def test_nuts_mvn_moments(nuts_posterior):
    x = np.asarray(nuts_posterior.positions["x"]).reshape(-1, 2)
    assert np.allclose(x.mean(0), np.asarray(MU), atol=0.25), x.mean(0)
    assert np.allclose(np.cov(x.T), np.asarray(COV), atol=0.45), np.cov(x.T)


def test_nuts_adaptive_depth(nuts_posterior):
    depths = np.asarray(nuts_posterior.infos.depth)
    steps = np.asarray(nuts_posterior.infos.num_integration_steps)
    assert depths.max() >= 1
    assert depths.max() <= 8
    # trajectory lengths vary (that's the point of NUTS)
    assert len(np.unique(steps)) > 2


def test_nuts_no_divergences(nuts_posterior):
    assert np.asarray(nuts_posterior.infos.is_divergent).mean() < 0.02


def test_nuts_acceptance_stat_in_range(nuts_posterior):
    acc = np.asarray(nuts_posterior.infos.acceptance_prob)
    assert np.all(acc >= 0.0) and np.all(acc <= 1.0)
    assert 0.5 < acc.mean() <= 1.0


def test_nuts_single_step_reproducible():
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = nuts.build_kernel(logdensity, max_tree_depth=6)
    state = nuts.init({"x": jnp.zeros(2)}, logdensity)
    inv_mass = {"x": jnp.ones(2)}
    k = jax.random.key(5)
    s1, i1 = kernel(k, state, jnp.float32(0.3), inv_mass)
    s2, i2 = kernel(k, state, jnp.float32(0.3), inv_mass)
    assert np.allclose(s1.position["x"], s2.position["x"])
    assert int(i1.num_integration_steps) == int(i2.num_integration_steps)
