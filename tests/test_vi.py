"""Mean-field VI tests: ADVI recovers the conjugate-Gaussian posterior."""

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.inference import vi


def test_advi_conjugate_gaussian():
    key = jax.random.key(0)
    n = 256
    y = 2.0 + jax.random.normal(key, (n,))
    ybar = float(y.mean())
    post_mean = n * ybar / (n + 1)
    post_std = np.sqrt(1.0 / (n + 1))

    def logdensity(params, batch):
        mu = params["mu"]
        (yb,) = batch
        scale = n / yb.shape[0]
        return -0.5 * jnp.sum((yb - mu) ** 2) * scale - 0.5 * mu**2

    state = vi.init({"mu": jnp.float32(0.0)})
    kernel = vi.build_kernel(logdensity, num_mc_samples=4, learning_rate=5e-2)

    @jax.jit
    def run(state, key):
        def body(s, k):
            kb, ks = jax.random.split(k)
            idx = jax.random.randint(kb, (64,), 0, n)
            s, loss = kernel(ks, s, (y[idx],))
            return s, loss

        return jax.lax.scan(body, state, jax.random.split(key, 2000))

    state, losses = run(state, jax.random.key(1))
    q_mean = float(state.mu["mu"])
    q_std = float(jnp.exp(state.rho["mu"]))
    assert abs(q_mean - post_mean) < 0.1, (q_mean, post_mean)
    assert 0.3 * post_std < q_std < 3.0 * post_std, (q_std, post_std)
    # ELBO improved
    assert float(losses[-200:].mean()) < float(losses[:200].mean())


def test_vi_sample_from_shapes():
    state = vi.init({"w": jnp.zeros((3, 2)), "b": jnp.zeros(2)})
    draws = vi.sample_from(state, jax.random.key(0), 10)
    assert draws["w"].shape == (10, 3, 2)
    assert draws["b"].shape == (10, 2)
