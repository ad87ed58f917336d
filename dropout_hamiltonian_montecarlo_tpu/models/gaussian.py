"""1-D / diagonal Gaussian density target.

Capability parity with /root/reference/hamiltonian/models/cpu/gaussian.py:14-27
(pointwise normal log-density target used as a sampler sanity check), expressed
as a pure log-density with jax.grad replacing the hand-written (x-mu)/sigma^2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model


class Gaussian(Model):
    """Independent Gaussian target N(mu, sigma^2) over params['x']."""

    def __init__(self, mu=0.0, sigma=1.0, dim: int = 1):
        self.mu = jnp.asarray(mu, jnp.float32)
        self.sigma = jnp.asarray(sigma, jnp.float32)
        self.dim = dim

    def log_prior(self, params):
        return jnp.float32(0.0)

    def log_likelihood(self, params, batch=None):
        x = params["x"]
        z = (x - self.mu) / self.sigma
        return jnp.sum(
            -0.5 * z * z - jnp.log(self.sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
        )

    def init_params(self, key):
        return {"x": jnp.zeros((self.dim,), jnp.float32)}

    def analytic_grad(self, params, batch=None):
        """Closed-form grad of the log density (golden test vs jax.grad);
        reference: /root/reference/hamiltonian/models/cpu/gaussian.py:14-20."""
        x = params["x"]
        return {"x": -(x - self.mu) / (self.sigma**2)}
