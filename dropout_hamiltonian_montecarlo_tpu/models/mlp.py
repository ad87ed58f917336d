"""Bayesian dropout MLP — the deep model of the zoo.

Capability parity with /root/reference/hamiltonian/models/gpu/mlp.py (Chainer
3-layer MLP n_in->n_mid->n_mid->n_out with ReLU + dropout after each hidden
layer and before the output :19-31, Gaussian prior -0.5*alpha*||theta||^2
:40-45, autodiff grad :47-64, predict :84-96).  Chainer autodiff becomes
jax.grad of a pure forward; dropout masks are driven by an explicit PRNG key so
the potential is deterministic per (chain, step) — the property the reference
could not give (its masks were global-RNG side effects) and that SGHMC-over-
dropout-networks (BASELINE config 4) requires.

Params: {'W1','b1','W2','b2','W3','b3'}; batch: (X[B,D], y[B,K] one-hot).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .base import Model


class DropoutMLP(Model):
    def __init__(self, dim: int, hidden: int, n_classes: int,
                 alpha: float = 1e-2, p_drop: float = 0.1):
        self.dim = dim
        self.hidden = hidden
        self.n_classes = n_classes
        self.alpha = jnp.float32(alpha)
        self.p_drop = p_drop

    # ---- forward ------------------------------------------------------------

    def logits(self, params, X, key: Optional[jax.Array] = None):
        """Forward pass; with a key, applies dropout PRE-ReLU on each hidden
        linear output and once more before the output layer — exactly the
        reference's placement (gpu/mlp.py:29-31: relu(dropout(l1(x))),
        relu(dropout(l2(h))), l3(dropout(h))).  Without a key the pass is
        deterministic (no mask, no rescale — the reference's Chainer eval
        mode)."""
        keep = 1.0 - self.p_drop

        def drop(k, h):
            mask = jax.random.bernoulli(k, keep, h.shape)
            return jnp.where(mask, h / keep, 0.0).astype(h.dtype)

        if key is not None:
            k1, k2, k3 = jax.random.split(key, 3)

        z = X @ params["W1"] + params["b1"]
        if key is not None:
            z = drop(k1, z)
        h = jax.nn.relu(z)
        z = h @ params["W2"] + params["b2"]
        if key is not None:
            z = drop(k2, z)
        h = jax.nn.relu(z)
        if key is not None:
            h = drop(k3, h)
        return h @ params["W3"] + params["b3"]

    # ---- Model interface ----------------------------------------------------

    def log_prior(self, params):
        sq = sum(jnp.sum(p * p) for p in jax.tree_util.tree_leaves(params))
        return -0.5 * self.alpha * sq

    def log_likelihood(self, params, batch, key: Optional[jax.Array] = None):
        X, y = batch
        z = self.logits(params, X, key)
        logp = z - jax.scipy.special.logsumexp(z, axis=-1, keepdims=True)
        return jnp.sum(y * logp)

    def log_posterior(self, params, batch=None, data_size=None,
                      key: Optional[jax.Array] = None):
        ll = self.log_likelihood(params, batch, key)
        if data_size is not None and batch is not None:
            ll = (data_size / batch[0].shape[0]) * ll
        return self.log_prior(params) + ll

    def make_batched_logdensity(self, data_size, dropout: bool = False):
        """Minibatch log density; with dropout=True the callable takes
        (params, batch, key) and threads the mask key into the forward."""
        if dropout:
            def logdensity(params, batch, key):
                return self.log_posterior(params, batch, data_size, key)
        else:
            def logdensity(params, batch):
                return self.log_posterior(params, batch, data_size)
        return logdensity

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)

        def glorot(k, shape):
            scale = jnp.sqrt(2.0 / (shape[0] + shape[1]))
            return scale * jax.random.normal(k, shape, jnp.float32)

        return {
            "W1": glorot(k1, (self.dim, self.hidden)),
            "b1": jnp.zeros((self.hidden,), jnp.float32),
            "W2": glorot(k2, (self.hidden, self.hidden)),
            "b2": jnp.zeros((self.hidden,), jnp.float32),
            "W3": glorot(k3, (self.hidden, self.n_classes)),
            "b3": jnp.zeros((self.n_classes,), jnp.float32),
        }

    def predict(self, params, X, prob: bool = False):
        p = jax.nn.softmax(self.logits(params, X), axis=-1)
        return p if prob else jnp.argmax(p, axis=-1)

    def predict_stochastic(self, params, X, key, prob: bool = False):
        """MC-dropout prediction: one stochastic forward per call
        (reference pattern: cpu/softmax.py:91-100 applied to the MLP)."""
        p = jax.nn.softmax(self.logits(params, X, key), axis=-1)
        return p if prob else jnp.argmax(p, axis=-1)
