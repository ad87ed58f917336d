"""Effective sample size via batched FFT autocorrelation.

ESS is the unit of the framework's headline metric (effective samples/sec,
BASELINE.json).  Implementation follows Stan/Vehtari et al.: per-chain FFT
autocovariance, Geyer initial monotone positive sequence truncation, combined
across chains with between-chain variance — all vectorized over the parameter
axis so one FFT batch covers every coordinate of the posterior at once (no
per-parameter Python loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _autocovariance_fft(x):
    """Per-chain autocovariance.  x: (chains, draws).  Returns (chains, draws)."""
    n = x.shape[-1]
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    # zero-pad to the next power of two >= 2n for linear (non-circular) acf
    m = 1
    while m < 2 * n:
        m *= 2
    f = jnp.fft.rfft(x, n=m, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=-1)[..., :n]
    return acov / n


def effective_sample_size(samples, block_size=None) -> jnp.ndarray:
    """ESS per parameter.

    samples: (num_chains, num_draws) or (num_chains, num_draws, ...) — extra
    axes are treated as independent parameters; returns ESS with those axes.

    block_size > 0 processes the parameter axis in sequential blocks
    (lax.map): the FFT autocovariance buffer is (P, C, 2*draws) complex, so
    at e.g. P=7850, C=128, draws=1000 the all-at-once batch is ~16 GB —
    blocking bounds it at block_size/P of that.  block_size=None (default)
    picks a block bounding the buffer at ~256 MB automatically (observed:
    summarize() on a (128, 200, 784, 10) draw block OOMs a 16 GB chip without
    it); block_size=0 forces the single all-at-once batch.
    """
    samples = jnp.asarray(samples)
    scalar_input = samples.ndim == 2
    if scalar_input:
        samples = samples[..., None]
    chains, draws = samples.shape[0], samples.shape[1]
    param_shape = samples.shape[2:]
    x = samples.reshape(chains, draws, -1).transpose(2, 0, 1)  # (P, C, N)

    if block_size is None:
        m = 1
        while m < 2 * draws:
            m *= 2
        # ~3 live (block, C, m) complex64 temporaries through rfft/irfft
        per_param_bytes = chains * m * 8 * 3
        fit = max(int((1 << 28) // max(per_param_bytes, 1)), 1)
        block_size = 0 if fit >= x.shape[0] else fit

    if block_size and x.shape[0] > block_size:
        P = x.shape[0]
        n_blocks = -(-P // block_size)
        pad = n_blocks * block_size - P
        xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        blocks = xp.reshape(n_blocks, block_size, chains, draws)
        ess_blocks = jax.lax.map(_ess_of_block, blocks)     # sequential
        ess = ess_blocks.reshape(-1)[:P]
        if scalar_input:
            return ess[0]
        return ess.reshape(param_shape)

    return _finish_ess(x, scalar_input, param_shape)


def _ess_of_block(x):
    """ESS over a (P, C, N) block (flat output)."""
    return _finish_ess(x, scalar_input=False, param_shape=(x.shape[0],))


def _finish_ess(x, scalar_input, param_shape):
    chains, draws = x.shape[1], x.shape[2]
    acov = jax.vmap(_autocovariance_fft)(x)                    # (P, C, N)
    chain_var = acov[..., 0] * draws / (draws - 1.0)           # (P, C)
    mean_var = jnp.mean(chain_var, axis=-1)                    # W, (P,)

    if chains > 1:
        chain_means = jnp.mean(x, axis=-1)                     # (P, C)
        between = draws * jnp.var(chain_means, axis=-1, ddof=1)
        var_plus = mean_var * (draws - 1.0) / draws + between / draws
    else:
        var_plus = mean_var

    mean_acov = jnp.mean(acov, axis=1)                         # (P, N)
    rho = 1.0 - (mean_var[:, None] - mean_acov) / var_plus[:, None]
    rho = rho.at[:, 0].set(1.0)

    # Geyer: sum consecutive pairs, keep while positive, enforce monotone.
    n_pairs = draws // 2
    paired = rho[:, : 2 * n_pairs].reshape(-1, n_pairs, 2).sum(-1)  # (P, K)
    # monotone decreasing envelope
    paired = jax.lax.associative_scan(jnp.minimum, paired, axis=1)
    positive = paired > 0.0
    # stop at first non-positive pair
    keep = jnp.cumprod(positive.astype(jnp.float32), axis=1)
    tau = -1.0 + 2.0 * jnp.sum(paired * keep, axis=1)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.float32(draws) + 1.0))

    ess = chains * draws / tau
    ess = jnp.minimum(ess, jnp.float32(chains * draws) * 1.0)
    if scalar_input:
        return ess[0]
    return ess.reshape(param_shape)


def ess_pytree(positions):
    """ESS over a posterior pytree with leading (chains, draws) axes."""
    return jax.tree_util.tree_map(effective_sample_size, positions)
