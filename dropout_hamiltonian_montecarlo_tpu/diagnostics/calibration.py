"""Predictive-calibration diagnostics: ECE, reliability bins, NLL.

BASELINE.json's posterior-parity criterion is "MNIST accuracy AND CALIBRATION
within MC error"; the reference's only uncertainty artifact is the
posterior-band plot of notebook 1 cell 12 and MC-dropout predictive sampling
(/root/reference/hamiltonian/models/cpu/softmax.py:91-100).  This module
makes calibration quantitative: expected calibration error over confidence
bins, the reliability diagram data itself, and predictive NLL — computable
for any (N, K) probability matrix, e.g. a posterior-predictive mean or an
MC-dropout average.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def reliability_bins(probs: jnp.ndarray, labels: jnp.ndarray,
                     num_bins: int = 15):
    """Per-bin (count, mean confidence, mean accuracy) over max-prob bins.

    probs: (N, K) predictive probabilities; labels: (N,) int classes.
    Returns (counts (B,), conf (B,), acc (B,)) — the reliability diagram.
    Jit-safe (fixed-size bincount segments).
    """
    conf = jnp.max(probs, axis=-1)                       # (N,)
    pred = jnp.argmax(probs, axis=-1)
    correct = (pred == labels).astype(jnp.float32)

    # bin by confidence in (0, 1]: bin b covers (b/B, (b+1)/B]
    idx = jnp.clip((conf * num_bins).astype(jnp.int32), 0, num_bins - 1)
    counts = jnp.zeros(num_bins).at[idx].add(1.0)
    conf_sum = jnp.zeros(num_bins).at[idx].add(conf)
    acc_sum = jnp.zeros(num_bins).at[idx].add(correct)
    safe = jnp.maximum(counts, 1.0)
    return counts, conf_sum / safe, acc_sum / safe


def expected_calibration_error(probs: jnp.ndarray, labels: jnp.ndarray,
                               num_bins: int = 15) -> jnp.ndarray:
    """ECE = sum_b (n_b / N) * |acc_b - conf_b| (Guo et al. 2017)."""
    counts, conf, acc = reliability_bins(probs, labels, num_bins)
    n = jnp.sum(counts)
    return jnp.sum(counts / n * jnp.abs(acc - conf))


def predictive_nll(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log-likelihood of the true labels."""
    p = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(jnp.log(jnp.maximum(p, 1e-12)))


def posterior_predictive_probs(predict_prob_fn, draws, X,
                               max_draws: int = 64) -> jnp.ndarray:
    """Average class probabilities over (a thinned subset of) posterior draws.

    predict_prob_fn: (params, X) -> (N, K) probabilities.
    draws: pytree with leading (chains, num_draws, ...) axes.
    The posterior-predictive p(y|x) = E_post[softmax(...)] is the quantity
    whose calibration BASELINE.json grades (MC-dropout prediction is the
    same average over mask draws, reference cpu/softmax.py:91-100).
    """
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), draws)
    total = jax.tree_util.tree_leaves(flat)[0].shape[0]
    take = min(max_draws, total)
    stride = max(total // take, 1)
    sub = jax.tree_util.tree_map(lambda a: a[::stride][:take], flat)

    def one(params):
        return predict_prob_fn(params, X)

    return jnp.mean(jax.lax.map(one, sub), axis=0)


def calibration_report(probs, labels, num_bins: int = 15) -> Dict[str, float]:
    acc = float(jnp.mean((jnp.argmax(probs, -1) == labels)))
    return {
        "accuracy": acc,
        "ece": float(expected_calibration_error(probs, labels, num_bins)),
        "nll": float(predictive_nll(probs, labels)),
    }
