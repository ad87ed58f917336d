"""HDF5 posterior-sample backend with streaming append + aggregation.

Parity with the reference's per-worker HDF5 backends (resizable per-variable
datasets, append + flush per draw, /root/reference/hamiltonian/inference/cpu/
sgld_multicore.py:38-57,86-89) and the posterior-mean aggregation
``backend_mean`` (cpu/hmc.py:132-138).  Differences by design: draws are
appended in CHUNKS (one device->host transfer per collection block, not per
draw — HBM->host transfers are the scaling risk, SURVEY.md §7), and files can
be read back for resume (the reference never reads its files back).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax

Params = Any


class HDF5Backend:
    """Append-only posterior store: one resizable dataset per pytree leaf."""

    def __init__(self, path: str, mode: str = "a"):
        import h5py

        self.path = path
        self._f = h5py.File(path, mode)

    def _leaf_names(self, positions):
        flat, _ = jax.tree_util.tree_flatten_with_path(positions)
        return [
            ("/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path),
             leaf)
            for path, leaf in flat
        ]

    def append(self, positions: Params) -> None:
        """positions: pytree with a leading draws axis (a collection block)."""
        for name, leaf in self._leaf_names(positions):
            arr = np.asarray(leaf)
            if name not in self._f:
                self._f.create_dataset(
                    name, data=arr, maxshape=(None,) + arr.shape[1:],
                    chunks=True,
                )
            else:
                ds = self._f[name]
                n0 = ds.shape[0]
                ds.resize(n0 + arr.shape[0], axis=0)
                ds[n0:] = arr
        self._f.flush()

    def read(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(self._f[k]) for k in _walk(self._f)}

    def num_draws(self) -> int:
        """Length of the leading (draws) axis; 0 for an empty file."""
        names = list(_walk(self._f))
        return int(self._f[names[0]].shape[0]) if names else 0

    def truncate(self, n: int) -> None:
        """Shrink every dataset to n draws on axis 0 (no-op if already <= n).

        Crash-recovery hook for the streaming sampler: the chunk append and
        the checkpoint write are two operations, so a crash between them
        leaves the backend one chunk AHEAD of the checkpoint's draw counter —
        resume truncates back to the counter before appending
        (inference/sampling.sample_posterior_streaming)."""
        for name in _walk(self._f):
            ds = self._f[name]
            if ds.shape[0] > n:
                ds.resize(n, axis=0)
        self._f.flush()

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _walk(group, prefix=""):
    import h5py

    for k, v in group.items():
        name = f"{prefix}{k}"
        if isinstance(v, h5py.Group):
            yield from _walk(v, name + "/")
        else:
            yield name


def posterior_mean(paths: Sequence[str]) -> Dict[str, np.ndarray]:
    """Weighted posterior mean across sample files (the reference's
    backend_mean, cpu/hmc.py:132-138, generalized to unequal draw counts)."""
    import h5py

    sums: Dict[str, np.ndarray] = {}
    counts: Dict[str, int] = {}
    for p in paths:
        with h5py.File(p, "r") as f:
            for name in _walk(f):
                arr = np.asarray(f[name])
                sums[name] = sums.get(name, 0.0) + arr.sum(axis=0)
                counts[name] = counts.get(name, 0) + arr.shape[0]
    return {k: sums[k] / counts[k] for k in sums}
