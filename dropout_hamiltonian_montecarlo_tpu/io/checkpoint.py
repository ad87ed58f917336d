"""Checkpoint / resume for sampler state.

New capability (SURVEY.md §5: the reference checkpoints samples but has no
resume path — 'nothing ever reads the files back').  A checkpoint captures the
full resumable state: sampler state pytree, adapted step size / inverse mass,
PRNG key, and draw counter.  Format: a single .npz per host (flat names via
tree paths) — no external deps; swap for Orbax on multi-host pods.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Any


def _flatten_names(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = [
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for path, _ in flat
    ]
    return names, [leaf for _, leaf in flat], treedef


def save_checkpoint(path: str, state: Params, *, key: jax.Array,
                    step: int, extras: Optional[Dict[str, Params]] = None
                    ) -> None:
    """Atomically write (state, key, step, extras) to ``path`` (.npz)."""
    payload = {"__step__": np.asarray(step)}
    payload["__key__"] = np.asarray(jax.random.key_data(key))

    def pack(prefix, tree):
        names, leaves, _ = _flatten_names(tree)
        for n, leaf in zip(names, leaves):
            payload[f"{prefix}::{n}"] = np.asarray(leaf)

    pack("state", state)
    for group, tree in (extras or {}).items():
        pack(f"extra.{group}", tree)

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, state_like: Params,
                    extras_like: Optional[Dict[str, Params]] = None):
    """Load a checkpoint written by save_checkpoint; trees are rebuilt in the
    structure of the provided templates.  Returns (state, key, step, extras)."""
    data = np.load(path)
    step = int(data["__step__"])
    key = jax.random.wrap_key_data(jnp.asarray(data["__key__"]))

    def unpack(prefix, like):
        names, leaves, treedef = _flatten_names(like)
        new_leaves = []
        for n, leaf in zip(names, leaves):
            arr = jnp.asarray(data[f"{prefix}::{n}"])
            if arr.shape != jnp.shape(leaf):
                raise ValueError(
                    f"checkpoint leaf {prefix}::{n} shape {arr.shape} != "
                    f"template {jnp.shape(leaf)}"
                )
            new_leaves.append(arr.astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    state = unpack("state", state_like)
    extras = {
        g: unpack(f"extra.{g}", t) for g, t in (extras_like or {}).items()
    }
    return state, key, step, extras
