"""Posterior summary: mean/std/ESS/R-hat table over a posterior pytree."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .ess import effective_sample_size
from .rhat import split_rhat


def summarize(positions, elapsed_seconds: float = None) -> Dict[str, Any]:
    """positions: pytree with leading (chains, draws) axes.

    Returns per-leaf dict of {mean, std, ess, rhat} plus scalar aggregates
    (min/median ESS, max R-hat, ess_per_sec when elapsed is given) — the
    numbers behind the bench harness's headline metric.
    """
    out = {}
    all_ess = []
    all_rhat = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(positions)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        ess = effective_sample_size(leaf)
        rhat = split_rhat(leaf)
        out[name] = {
            "mean": jnp.mean(leaf, axis=(0, 1)),
            "std": jnp.std(leaf, axis=(0, 1)),
            "ess": ess,
            "rhat": rhat,
        }
        all_ess.append(jnp.ravel(ess))
        all_rhat.append(jnp.ravel(rhat))
    ess_cat = jnp.concatenate(all_ess)
    rhat_cat = jnp.concatenate(all_rhat)
    out["aggregate"] = {
        "min_ess": jnp.min(ess_cat),
        "median_ess": jnp.median(ess_cat),
        "max_rhat": jnp.max(rhat_cat),
    }
    if elapsed_seconds is not None:
        out["aggregate"]["min_ess_per_sec"] = jnp.min(ess_cat) / elapsed_seconds
        out["aggregate"]["median_ess_per_sec"] = (
            jnp.median(ess_cat) / elapsed_seconds
        )
    return out
