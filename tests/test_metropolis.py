"""Random-walk Metropolis tests: the reference's mh_mvn.png criterion made
quantitative, plus scale-tuning band behavior (cpu/metropolis.py:105-128)."""

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.inference import metropolis
from dropout_hamiltonian_montecarlo_tpu.inference.base import run_inference
from dropout_hamiltonian_montecarlo_tpu.models import MVNGaussian

MU = jnp.array([0.5, -0.5])
COV = jnp.array([[1.0, 0.3], [0.3, 0.5]])


def test_mvn_moments():
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = metropolis.build_kernel(logdensity)
    state = metropolis.init({"x": jnp.zeros(2)}, logdensity)

    key = jax.random.key(0)
    kw, ks = jax.random.split(key)
    state, scale = metropolis.run_warmup_scale(
        kernel, state, kw, num_steps=500, initial_scale=0.5
    )

    def fixed(k, s):
        return kernel(k, s, scale)

    _, (states, infos) = run_inference(fixed, state, ks, num_samples=5000)
    x = np.asarray(states.position["x"])
    assert np.allclose(x.mean(0), np.asarray(MU), atol=0.2), x.mean(0)
    assert np.allclose(np.cov(x.T), np.asarray(COV), atol=0.35)
    acc = np.asarray(infos.is_accepted).mean()
    assert 0.1 < acc < 0.9, acc


def test_tune_scale_bands():
    s = jnp.float32(1.0)
    assert float(metropolis.tune_scale(s, 0.0005)) == np.float32(0.1)
    assert float(metropolis.tune_scale(s, 0.03)) == np.float32(0.5)
    assert float(metropolis.tune_scale(s, 0.15)) == np.float32(0.9)
    assert float(metropolis.tune_scale(s, 0.3)) == 1.0
    assert float(metropolis.tune_scale(s, 0.6)) == np.float32(1.1)
    assert float(metropolis.tune_scale(s, 0.8)) == 2.0
    assert float(metropolis.tune_scale(s, 0.99)) == 10.0


def test_deterministic_given_key():
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = metropolis.build_kernel(logdensity)
    state = metropolis.init({"x": jnp.zeros(2)}, logdensity)
    k = jax.random.key(3)
    s1, _ = kernel(k, state, jnp.float32(0.5))
    s2, _ = kernel(k, state, jnp.float32(0.5))
    assert np.allclose(s1.position["x"], s2.position["x"])


def test_coordinate_wise_moves_one_coordinate():
    """coordinate_wise=True: each step changes at most one coordinate
    (reference mode: /root/reference/hamiltonian/inference/cpu/metropolis.py:58-62)."""
    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = metropolis.build_kernel(logdensity, coordinate_wise=True)
    state = metropolis.init({"x": jnp.zeros(2), "z": jnp.ones(3)}, logdensity)
    ks = jax.random.split(jax.random.key(5), 50)
    for k in ks:
        new, _ = kernel(k, state, jnp.float32(0.5))
        moved = sum(
            int(np.sum(np.asarray(a) != np.asarray(b)))
            for a, b in zip(jax.tree_util.tree_leaves(new.position),
                            jax.tree_util.tree_leaves(state.position))
        )
        assert moved <= 1
        state = new


def test_coordinate_wise_samples_target():
    """Single-coordinate MH still recovers the MVN target moments."""
    from dropout_hamiltonian_montecarlo_tpu.inference.base import run_inference

    model = MVNGaussian(MU, COV)
    logdensity = model.make_logdensity()
    kernel = metropolis.build_kernel(logdensity, coordinate_wise=True)
    state = metropolis.init({"x": jnp.zeros(2)}, logdensity)
    ks = jax.random.key(6)

    def fixed(k, s):
        return kernel(k, s, jnp.float32(1.0))

    _, (states, infos) = run_inference(fixed, state, ks, num_samples=8000)
    x = np.asarray(states.position["x"])[2000:]
    assert np.allclose(x.mean(0), np.asarray(MU), atol=0.3), x.mean(0)
