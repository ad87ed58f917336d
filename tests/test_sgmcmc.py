"""SG-MCMC tests: SGLD/SGHMC sample a Gaussian target from minibatches and
land near the right posterior; schedules match the reference's decay law."""

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.inference import sgmcmc
from dropout_hamiltonian_montecarlo_tpu.models import Logistic, Softmax
from dropout_hamiltonian_montecarlo_tpu.utils import one_hot


def make_conjugate_gaussian_problem():
    """Target: posterior of mean mu with known sigma=1, prior N(0,1),
    data y_i ~ N(2, 1).  Posterior: N(n*ybar/(n+1), 1/(n+1))."""
    key = jax.random.key(0)
    n = 256
    y = 2.0 + jax.random.normal(key, (n,))
    ybar = float(y.mean())
    post_mean = n * ybar / (n + 1)
    post_var = 1.0 / (n + 1)

    def logdensity(params, batch):
        mu = params["mu"]
        (yb,) = batch
        scale = n / yb.shape[0]
        ll = -0.5 * jnp.sum((yb - mu) ** 2) * scale
        prior = -0.5 * mu**2
        return ll + prior

    return (y,), logdensity, post_mean, post_var


def test_sgld_posterior_mean():
    data, logdensity, post_mean, post_var = make_conjugate_gaussian_problem()
    kernel = sgmcmc.build_sgld_kernel(logdensity)
    state = sgmcmc.sgld_init({"mu": jnp.float32(0.0)})
    schedule = sgmcmc.constant_schedule(5e-4)
    _, positions, infos = sgmcmc.run_sgmcmc(
        kernel, state, jax.random.key(1), data, batch_size=32,
        num_steps=4000, step_size_schedule=schedule,
        collect_every=2, burnin_steps=1000,
    )
    mus = np.asarray(positions["mu"])
    assert abs(mus.mean() - post_mean) < 0.15, (mus.mean(), post_mean)
    # SGLD variance inflated by stochastic grads; just sanity-band it
    assert mus.std() < 10 * np.sqrt(post_var) + 0.2


def test_sghmc_posterior_mean():
    data, logdensity, post_mean, post_var = make_conjugate_gaussian_problem()
    # persistent momentum (Chen et al. dynamics): friction+noise equilibrate
    kernel = sgmcmc.build_sghmc_kernel(logdensity, friction=1.0,
                                       num_leapfrog=1)
    state = sgmcmc.sghmc_init({"mu": jnp.float32(0.0)})
    schedule = sgmcmc.constant_schedule(1e-3)
    _, positions, _ = sgmcmc.run_sgmcmc(
        kernel, state, jax.random.key(2), data, batch_size=32,
        num_steps=6000, step_size_schedule=schedule,
        collect_every=2, burnin_steps=3000,
    )
    mus = np.asarray(positions["mu"])
    assert abs(mus.mean() - post_mean) < 0.25, (mus.mean(), post_mean)


def test_inverse_time_decay_matches_reference_law():
    """eps_t = eps0/(1 + decay*t) with decay=eps0 by default
    (reference cpu/sgmcmc.py:88-89)."""
    sched = sgmcmc.inverse_time_decay(0.1)
    assert np.isclose(float(sched(0.0)), 0.1)
    assert np.isclose(float(sched(10.0)), 0.1 / (1 + 0.1 * 10))


def _mlp_problem(n=256, d=8, k=3, hidden=16):
    from dropout_hamiltonian_montecarlo_tpu.models import DropoutMLP

    key = jax.random.key(0)
    kx, kw = jax.random.split(key)
    X = jax.random.normal(kx, (n, d))
    true_w = jax.random.normal(kw, (d, k))
    yi = jnp.argmax(X @ true_w, axis=-1)
    y = one_hot(yi, k)
    model = DropoutMLP(dim=d, hidden=hidden, n_classes=k, alpha=0.1,
                       p_drop=0.2)
    return model, (X, y), yi


def test_sgld_dropout_potential_deterministic_per_step():
    """Dropout-in-MCMC (the repo-title capability): the keyed SGLD kernel
    threads a per-step mask key through the dropout-MLP potential; the same
    driver key must reproduce the draws exactly (masks deterministic per
    (chain, step))."""
    model, (X, y), _ = _mlp_problem()
    logdensity = model.make_batched_logdensity(data_size=X.shape[0],
                                               dropout=True)
    kernel = sgmcmc.build_sgld_kernel(logdensity, keyed=True)
    state = sgmcmc.sgld_init(model.init_params(jax.random.key(7)))

    def run():
        _, positions, _ = sgmcmc.run_sgmcmc(
            kernel, state, jax.random.key(11), (X, y), batch_size=64,
            num_steps=60, step_size_schedule=sgmcmc.constant_schedule(1e-4),
            collect_every=5, burnin_steps=10,
        )
        return positions

    a, b = run(), run()
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_dropout_posterior_differs_from_nodropout():
    """With the same seeds, the dropout potential must sample a DIFFERENT
    posterior than the deterministic one — guards the round-2 silent-no-op
    (CLI config 4 used to omit dropout from the potential entirely)."""
    model, (X, y), _ = _mlp_problem()
    ld_drop = model.make_batched_logdensity(data_size=X.shape[0],
                                            dropout=True)
    ld_plain = model.make_batched_logdensity(data_size=X.shape[0])
    state = sgmcmc.sgld_init(model.init_params(jax.random.key(7)))

    def run(kernel):
        _, positions, _ = sgmcmc.run_sgmcmc(
            kernel, state, jax.random.key(11), (X, y), batch_size=64,
            num_steps=200, step_size_schedule=sgmcmc.constant_schedule(1e-4),
            collect_every=10, burnin_steps=0,
        )
        return positions

    pos_drop = run(sgmcmc.build_sgld_kernel(ld_drop, keyed=True))
    pos_plain = run(sgmcmc.build_sgld_kernel(ld_plain))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), pos_drop, pos_plain)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-4, diffs


def test_sghmc_dropout_runs_and_improves():
    """Keyed SGHMC on the dropout-MLP potential: per-leapfrog-step masks,
    posterior-mean prediction beats the init (BASELINE config 4 shape)."""
    model, (X, y), yi = _mlp_problem(n=512)
    logdensity = model.make_batched_logdensity(data_size=X.shape[0],
                                               dropout=True)
    kernel = sgmcmc.build_sghmc_kernel(logdensity, friction=1.0,
                                       num_leapfrog=2, keyed=True)
    params0 = model.init_params(jax.random.key(5))
    state = sgmcmc.sghmc_init(params0)
    _, positions, infos = sgmcmc.run_sgmcmc(
        kernel, state, jax.random.key(6), (X, y), batch_size=64,
        num_steps=1500, step_size_schedule=sgmcmc.constant_schedule(3e-4),
        collect_every=10, burnin_steps=500,
    )
    assert np.all(np.isfinite(np.asarray(infos.logdensity)))
    pm = jax.tree_util.tree_map(lambda p: p.mean(0), positions)
    acc = float(jnp.mean((model.predict(pm, X) == yi).astype(jnp.float32)))
    acc0 = float(jnp.mean((model.predict(params0, X) == yi).astype(jnp.float32)))
    assert acc > max(acc0, 0.5), (acc0, acc)


def test_softmax_sgld_runs_and_improves():
    key = jax.random.key(0)
    kx, kp = jax.random.split(key)
    n, d, k = 512, 8, 3
    X = jax.random.normal(kx, (n, d))
    true_w = jax.random.normal(kp, (d, k))
    yi = jnp.argmax(X @ true_w, axis=-1)
    y = one_hot(yi, k)
    model = Softmax(dim=d, n_classes=k, alpha=1.0)
    logdensity = model.make_batched_logdensity(data_size=n)
    kernel = sgmcmc.build_sgld_kernel(logdensity)
    params0 = model.init_params(key)
    state = sgmcmc.sgld_init(params0)
    _, positions, infos = sgmcmc.run_sgmcmc(
        kernel, state, jax.random.key(3), (X, y), batch_size=64,
        num_steps=2000, step_size_schedule=sgmcmc.constant_schedule(1e-4),
        collect_every=10, burnin_steps=500,
    )
    post_mean_w = jax.tree_util.tree_map(lambda p: p.mean(0), positions)
    acc = float(
        jnp.mean((model.predict(post_mean_w, X) == yi).astype(jnp.float32))
    )
    acc0 = float(jnp.mean((model.predict(params0, X) == yi).astype(jnp.float32)))
    assert acc > max(acc0, 0.6), (acc0, acc)
