"""Split-R-hat potential scale reduction (Gelman-Rubin / Vehtari et al.).

New capability (the reference has no convergence diagnostics, SURVEY.md §5);
vectorized over all parameter coordinates at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def potential_scale_reduction(samples) -> jnp.ndarray:
    """Classic R-hat.  samples: (chains, draws, ...) -> R-hat per coordinate."""
    samples = jnp.asarray(samples)
    chains, draws = samples.shape[0], samples.shape[1]
    chain_mean = jnp.mean(samples, axis=1)                  # (C, ...)
    chain_var = jnp.var(samples, axis=1, ddof=1)            # (C, ...)
    w = jnp.mean(chain_var, axis=0)
    b = draws * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (draws - 1.0) / draws * w + b / draws
    return jnp.sqrt(var_plus / w)


def split_rhat(samples) -> jnp.ndarray:
    """Split each chain in half before computing R-hat (detects
    within-chain nonstationarity).  samples: (chains, draws, ...)."""
    samples = jnp.asarray(samples)
    draws = samples.shape[1]
    half = draws // 2
    first = samples[:, :half]
    second = samples[:, half : 2 * half]
    split = jnp.concatenate([first, second], axis=0)
    return potential_scale_reduction(split)


def split_rhat_pytree(positions):
    """Split-R-hat over a posterior pytree with leading (chains, draws) axes."""
    return jax.tree_util.tree_map(split_rhat, positions)
