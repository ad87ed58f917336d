"""Data preprocessing helpers.

Parity with /root/reference/hamiltonian/utils.py (one_hot :4-8, min-max scaler
:10-18, recursive flatten :20-26) — device-friendly versions (jnp, vectorized,
no Python recursion over ragged data needed for arrays).
"""

from __future__ import annotations

from typing import Iterable, List

import jax.numpy as jnp


def one_hot(y, num_classes: int, dtype=jnp.float32):
    """Integer labels -> one-hot matrix (B, num_classes)."""
    y = jnp.asarray(y, jnp.int32)
    return (y[..., None] == jnp.arange(num_classes)).astype(dtype)


class MinMaxScaler:
    """Min-max feature scaling: fit stores per-feature (min, max)."""

    def __init__(self):
        self.min_ = None
        self.max_ = None

    def fit(self, X):
        X = jnp.asarray(X)
        self.min_ = X.min(axis=0)
        self.max_ = X.max(axis=0)
        return self

    def transform(self, X):
        scale = jnp.where(self.max_ > self.min_, self.max_ - self.min_, 1.0)
        return (jnp.asarray(X) - self.min_) / scale

    def fit_transform(self, X):
        return self.fit(X).transform(X)


def flatten(items) -> List:
    """Recursively flatten nested iterables (the reference's utils.flatten)."""
    out: List = []
    for x in items:
        if isinstance(x, Iterable) and not isinstance(x, (str, bytes)):
            out.extend(flatten(x))
        else:
            out.append(x)
    return out
