"""Bayesian logistic regression.

Capability parity with /root/reference/hamiltonian/models/cpu/logistic.py
(sigmoid-Bernoulli likelihood :53-55, Gaussian prior with precision alpha
:15-21, analytic grad :24-41, predict :75-87).  Differences by design:

- log-likelihood uses the numerically stable log-sigmoid form instead of logit
  clipping to float range (:48-49);
- the minibatch posterior uses the unbiased (N/B)*sum scaling for BOTH value
  and gradient (the reference scales the value by 1/n but not the grad, :57-62);
- gradients come from jax.grad; the hand-derived X^T(y - yhat) - alpha*theta
  form is kept as ``analytic_grad`` and golden-tested against autodiff.

Params: {'weights': (D,), 'bias': ()} ; batch: (X[B,D] float, y[B] in {0,1}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model


class Logistic(Model):
    def __init__(self, dim: int, alpha: float = 1e-2):
        self.dim = dim
        self.alpha = jnp.float32(alpha)

    def log_prior(self, params):
        # N(0, alpha^-1 I) with normalization constants, matching the
        # reference's inclusion of the constant term (cpu/logistic.py:15-21).
        k = sum(p.size for p in jax.tree_util.tree_leaves(params))
        sq = sum(jnp.sum(p * p) for p in jax.tree_util.tree_leaves(params))
        return 0.5 * k * jnp.log(self.alpha / (2.0 * jnp.pi)) - 0.5 * self.alpha * sq

    def logits(self, params, X):
        return X @ params["weights"] + params["bias"]

    def log_likelihood(self, params, batch):
        X, y = batch
        z = self.logits(params, X)
        # sum_i [ y_i log s(z_i) + (1-y_i) log(1-s(z_i)) ], stable form.
        return jnp.sum(y * z - jax.nn.softplus(z))

    def init_params(self, key):
        kw, _ = jax.random.split(key)
        return {
            "weights": 1e-2 * jax.random.normal(kw, (self.dim,), jnp.float32),
            "bias": jnp.float32(0.0),
        }

    def predict(self, params, X, prob: bool = False):
        p = jax.nn.sigmoid(self.logits(params, X))
        return p if prob else (p > 0.5).astype(jnp.int32)

    def analytic_grad(self, params, batch):
        """Closed-form grad of the log posterior (golden test vs jax.grad);
        reference form at /root/reference/hamiltonian/models/cpu/logistic.py:24-41."""
        X, y = batch
        resid = y - jax.nn.sigmoid(self.logits(params, X))
        return {
            "weights": X.T @ resid - self.alpha * params["weights"],
            "bias": jnp.sum(resid) - self.alpha * params["bias"],
        }
