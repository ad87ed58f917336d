"""Finite-difference gradient checker.

Generalizes the reference's only verification utility — the central-difference
checker in /root/reference/hamiltonian/models/cpu/poisson.py:75-90 — to any
scalar function of a pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_gradient(fn, params, analytic_grad=None, dh: float = 1e-3,
                   rtol: float = 2e-2, atol: float = 2e-2) -> bool:
    # default dh/atol sized for float32 evaluation: round-off in the central
    # difference is ~eps_f32 * |f| / dh, so dh=1e-3 keeps it ~1e-2 for |f|~1e2.
    """Compare grad(fn) (or a provided analytic grad pytree) against central
    finite differences (f(x+h)-f(x-h))/2h on every coordinate.  Returns True
    if all coordinates match; raises AssertionError with the worst offender
    otherwise."""
    if analytic_grad is None:
        analytic_grad = jax.grad(fn)(params)

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    gflat, _ = jax.flatten_util.ravel_pytree(analytic_grad)
    flat = np.asarray(flat, np.float64)
    num = np.zeros_like(flat)
    for i in range(flat.size):
        e = np.zeros_like(flat)
        e[i] = dh
        fp = float(fn(unravel(jnp.asarray(flat + e, jnp.float32))))
        fm = float(fn(unravel(jnp.asarray(flat - e, jnp.float32))))
        num[i] = (fp - fm) / (2 * dh)
    g = np.asarray(gflat, np.float64)
    if not np.allclose(g, num, rtol=rtol, atol=atol):
        err = np.abs(g - num)
        i = int(np.argmax(err))
        raise AssertionError(
            f"gradient mismatch at flat index {i}: analytic={g[i]:.6g} "
            f"numeric={num[i]:.6g} (max abs err {err[i]:.3g})"
        )
    return True
