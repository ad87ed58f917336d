"""Bayesian Poisson GLM (log link).

Capability parity with /root/reference/hamiltonian/models/cpu/poisson.py
(log_poisson with gammaln :12-13, net=exp(Xw+b) :23-26, grad :28-38, predict
:71-73).  The reference ships this as pre-refactor module functions; here it is
a Model like the rest of the zoo.  Its ``check_gradient`` (:75-90) — the only
verification utility in the reference — becomes the framework-wide
finite-difference checker in dropout_hamiltonian_montecarlo_tpu/utils/gradcheck.py.

Params: {'weights': (D,), 'bias': ()} ; batch: (X[B,D], y[B] counts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model


class Poisson(Model):
    def __init__(self, dim: int, alpha: float = 1e-2):
        self.dim = dim
        self.alpha = jnp.float32(alpha)

    def log_prior(self, params):
        sq = sum(jnp.sum(p * p) for p in jax.tree_util.tree_leaves(params))
        return -0.5 * self.alpha * sq

    def log_rate(self, params, X):
        return X @ params["weights"] + params["bias"]

    def log_likelihood(self, params, batch):
        X, y = batch
        eta = self.log_rate(params, X)
        # log p(y|lambda) = y*eta - exp(eta) - log(y!)
        return jnp.sum(y * eta - jnp.exp(eta) - jax.scipy.special.gammaln(y + 1.0))

    def init_params(self, key):
        kw, _ = jax.random.split(key)
        return {
            "weights": 1e-2 * jax.random.normal(kw, (self.dim,), jnp.float32),
            "bias": jnp.float32(0.0),
        }

    def predict(self, params, X):
        return jnp.exp(self.log_rate(params, X))

    def analytic_grad(self, params, batch):
        """Closed-form grad of the log posterior (golden test vs jax.grad);
        reference form at /root/reference/hamiltonian/models/cpu/poisson.py:28-38."""
        X, y = batch
        resid = y - jnp.exp(self.log_rate(params, X))
        return {
            "weights": X.T @ resid - self.alpha * params["weights"],
            "bias": jnp.sum(resid) - self.alpha * params["bias"],
        }
