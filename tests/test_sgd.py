"""SGD + dropout-SGD tests (the reference's fit/fit_dropout,
cpu/sgd.py:25-66) and MC-dropout prediction round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.inference import sgd
from dropout_hamiltonian_montecarlo_tpu.models import Logistic, Softmax
from dropout_hamiltonian_montecarlo_tpu.utils import one_hot


def make_blobs(key, n=400, d=2, sep=3.0):
    """Two separable Gaussian blobs — notebook 1's simulated-data problem
    (reference benchmarks/1.-Simulated_data.ipynb cell 2)."""
    k1, k2 = jax.random.split(key)
    X0 = jax.random.normal(k1, (n // 2, d)) - sep / 2
    X1 = jax.random.normal(k2, (n // 2, d)) + sep / 2
    X = jnp.concatenate([X0, X1])
    y = jnp.concatenate([jnp.zeros(n // 2), jnp.ones(n // 2)])
    return X, y


def test_sgd_logistic_blobs_accuracy():
    key = jax.random.key(0)
    X, y = make_blobs(key)
    model = Logistic(dim=2, alpha=0.1)
    logdensity = model.make_batched_logdensity(data_size=X.shape[0])
    kernel = sgd.build_sgd_kernel(logdensity, gamma=0.9)
    state = sgd.sgd_init(model.init_params(key))
    state, losses = sgd.fit(
        kernel, state, jax.random.key(1), (X, y), batch_size=50,
        num_steps=2000, step_size=1e-3,
    )
    acc = float(jnp.mean((model.predict(state.position, X) == y).astype(jnp.float32)))
    # reference notebook 1 reaches 1.00 on separable blobs
    assert acc > 0.97, acc
    assert float(losses[-100:].mean()) < float(losses[:100].mean())


def test_dropout_sgd_trains():
    key = jax.random.key(0)
    X, y = make_blobs(key)
    model = Logistic(dim=2, alpha=0.1)
    logdensity = model.make_batched_logdensity(data_size=X.shape[0])
    kernel = sgd.build_sgd_kernel(logdensity, gamma=0.9, dropout_rate=0.3)
    state = sgd.sgd_init(model.init_params(key))
    state, _ = sgd.fit(
        kernel, state, jax.random.key(1), (X, y), batch_size=50,
        num_steps=2000, step_size=1e-3,
    )
    acc = float(jnp.mean((model.predict(state.position, X) == y).astype(jnp.float32)))
    assert acc > 0.9, acc


def test_mc_dropout_prediction_uncertainty():
    """MC-dropout predictive samples vary across keys and average to a
    sensible predictive distribution (reference predict_stochastic,
    cpu/softmax.py:91-100)."""
    key = jax.random.key(0)
    n, d, k = 128, 6, 3
    X = jax.random.normal(key, (n, d))
    model = Softmax(dim=d, n_classes=k)
    params = model.init_params(key)
    keys = jax.random.split(jax.random.key(1), 16)
    probs = jnp.stack(
        [model.predict_stochastic(params, X, kk, p_drop=0.5, prob=True)
         for kk in keys]
    )
    mean_prob = probs.mean(0)
    assert np.allclose(mean_prob.sum(-1), 1.0, atol=1e-4)
    assert float(probs.std(0).mean()) > 0.0
