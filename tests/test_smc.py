"""Tempered SMC tests: prior -> posterior on a conjugate Gaussian, correct
evidence estimate, systematic resampling properties."""

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.inference import hmc, smc


def test_systematic_resample_preserves_uniform():
    n = 1000
    idx = smc.systematic_resample(jax.random.key(0), jnp.zeros(n))
    # uniform weights -> identity-ish permutation, every parent appears once
    counts = np.bincount(np.asarray(idx), minlength=n)
    assert counts.max() == 1 and counts.min() == 1


def test_systematic_resample_concentrates():
    log_w = jnp.concatenate([jnp.zeros(10), jnp.full((90,), -100.0)])
    idx = np.asarray(smc.systematic_resample(jax.random.key(1), log_w))
    assert np.all(idx < 10)


def test_tempered_smc_gaussian_posterior():
    """Prior N(0,1), likelihood from y ~ N(mu, 1) with n obs: posterior is
    N(n*ybar/(n+1), 1/(n+1)); evidence is analytic too."""
    key = jax.random.key(0)
    n_obs = 64
    y = 1.5 + jax.random.normal(key, (n_obs,))
    ybar = float(y.mean())
    post_mean = n_obs * ybar / (n_obs + 1)
    post_var = 1.0 / (n_obs + 1)

    def log_prior(p):
        return -0.5 * p["mu"] ** 2 - 0.5 * jnp.log(2 * jnp.pi)

    def log_lik(p):
        return jnp.sum(-0.5 * (y - p["mu"]) ** 2 - 0.5 * jnp.log(2 * jnp.pi))

    n_particles = 512
    particles = {"mu": jax.random.normal(jax.random.key(1), (n_particles,))}

    state, info = smc.run_tempered_smc(
        jax.random.key(2), particles,
        log_prior, log_lik,
        kernel_builder=lambda ld: hmc.build_kernel(ld, 8),
        init_builder=lambda ld: (lambda p: hmc.init(p, ld)),
        step_size=0.2, num_mcmc_steps=5, target_ess=0.5,
    )
    assert float(state.lmbda) == 1.0
    assert int(info.num_stages) >= 1
    mus = np.asarray(state.particles["mu"])
    assert abs(mus.mean() - post_mean) < 0.1, (mus.mean(), post_mean)
    assert abs(mus.std() - np.sqrt(post_var)) < 0.1

    # analytic log evidence of N(ybar-model): integral of prior*lik
    # log Z = log N(y | 0, I + 11^T) — compute via marginal formula
    yv = np.asarray(y, np.float64)
    Sigma = np.eye(n_obs) + np.ones((n_obs, n_obs))
    sign, logdet = np.linalg.slogdet(Sigma)
    lz = (-0.5 * n_obs * np.log(2 * np.pi) - 0.5 * logdet
          - 0.5 * yv @ np.linalg.solve(Sigma, yv))
    assert abs(float(state.log_evidence) - lz) < 2.0, (
        float(state.log_evidence), lz)
