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


def local_chain_block(leaf, chain_axis: int = 1):
    """Extract THIS process's addressable chain rows from a global jax.Array.

    ``leaf`` is a global array sharded along ``chain_axis`` (possibly over
    multiple local devices).  Returns (block, global_indices): the local rows
    concatenated in global order along ``chain_axis``, and the global chain
    indices they correspond to.  For a plain numpy / fully-addressable array
    this is the identity (all chains, indices 0..C-1).
    """
    shards = getattr(leaf, "addressable_shards", None)
    if shards is None or getattr(leaf, "is_fully_addressable", True):
        arr = np.asarray(leaf)
        return arr, np.arange(arr.shape[chain_axis])
    seen = {}
    for s in shards:
        sl = s.index[chain_axis]
        start = 0 if sl.start is None else int(sl.start)
        if start not in seen:
            seen[start] = np.asarray(s.data)
    starts = sorted(seen)
    block = np.concatenate([seen[st] for st in starts], axis=chain_axis)
    idx = np.concatenate([
        np.arange(st, st + seen[st].shape[chain_axis]) for st in starts
    ])
    return block, idx


class ShardedHDF5Backend:
    """Per-process shard writer for multi-host runs.

    The reference writes per-worker HDF5 files and aggregates afterwards
    (/root/reference/hamiltonian/inference/cpu/sgld_multicore.py:86-89,
    cpu/hmc.py:132-138).  Multi-host global arrays are NOT fully addressable
    — ``np.asarray`` on them raises — so each process appends ONLY the chain
    rows it holds to its own ``<base>_<process>.h5`` file; the global chain
    indices are stored once per file (dataset ``__chain_indices__``) so
    ``assemble_shards`` can reassemble draws in global chain order.
    Single-process this degenerates to one file holding every chain, so the
    same driver code serves both.  Blocks must be (draws, chains, ...) with
    the chain axis sharded (the layout the streaming drivers append).
    """

    def __init__(self, base_path: str, mode: str = "a",
                 chain_axis: int = 1):
        import jax

        self.process_index = jax.process_index()
        root, ext = os.path.splitext(base_path)
        self.path = f"{root}_{self.process_index}{ext or '.h5'}"
        self.chain_axis = chain_axis
        self._b = HDF5Backend(self.path, mode)
        # a reopened (mode='a') shard file pins this process's chain
        # ownership: append() validates the CURRENT run's addressable
        # chains against it, so a mesh/process-layout change between runs
        # raises instead of silently mis-attributing chains on reassembly
        self._indices = (np.asarray(self._b._f["__chain_indices__"])
                         if "__chain_indices__" in self._b._f else None)

    def append(self, positions: Params) -> None:
        def to_local(leaf):
            block, idx = local_chain_block(leaf, self.chain_axis)
            if self._indices is None:
                self._indices = idx
            elif not np.array_equal(self._indices, idx):
                raise ValueError(
                    f"chain ownership mismatch: shard file holds global "
                    f"chains {self._indices.tolist()} but this append's "
                    f"addressable chains are {idx.tolist()} — the mesh / "
                    f"process layout differs from the earlier appends")
            return block

        self._b.append(jax.tree_util.tree_map(to_local, positions))
        if "__chain_indices__" not in self._b._f:
            self._b._f.create_dataset("__chain_indices__",
                                      data=self._indices)
            self._b._f.flush()

    def read(self) -> Dict[str, np.ndarray]:
        return {k: v for k, v in self._b.read().items()
                if k != "__chain_indices__"}

    def num_draws(self) -> int:
        names = [n for n in _walk(self._b._f) if n != "__chain_indices__"]
        return int(self._b._f[names[0]].shape[0]) if names else 0

    def truncate(self, n: int) -> None:
        for name in _walk(self._b._f):
            if name == "__chain_indices__":
                continue
            ds = self._b._f[name]
            if ds.shape[0] > n:
                ds.resize(n, axis=0)
        self._b._f.flush()

    def close(self) -> None:
        self._b.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def shard_paths(base_path: str, num_processes: int) -> List[str]:
    """The per-process file names ShardedHDF5Backend(base_path) writes."""
    root, ext = os.path.splitext(base_path)
    return [f"{root}_{p}{ext or '.h5'}" for p in range(num_processes)]


def assemble_shards(paths: Sequence[str],
                    chain_axis: int = 1) -> Dict[str, np.ndarray]:
    """Reassemble per-process shard files into global (draws, chains, ...)
    arrays, chains restored to GLOBAL order via each file's stored
    ``__chain_indices__`` (the multi-host counterpart of the reference's
    host-side posterior concatenation, cpu/hmc_multicore.py:33-38)."""
    import h5py

    blocks: Dict[str, list] = {}
    indices = []
    for p in paths:
        with h5py.File(p, "r") as f:
            idx = np.asarray(f["__chain_indices__"])
            indices.append(idx)
            for name in _walk(f):
                if name == "__chain_indices__":
                    continue
                blocks.setdefault(name, []).append(np.asarray(f[name]))
    all_idx = np.concatenate(indices)
    order = np.argsort(all_idx)
    if not np.array_equal(all_idx[order], np.arange(all_idx.size)):
        raise ValueError(f"shard files do not cover a contiguous chain "
                         f"range: indices {np.sort(all_idx)}")
    out = {}
    for name, parts in blocks.items():
        cat = np.concatenate(parts, axis=chain_axis)
        out[name] = np.take(cat, order, axis=chain_axis)
    return out


def posterior_mean(paths: Sequence[str]) -> Dict[str, np.ndarray]:
    """Weighted posterior mean across sample files (the reference's
    backend_mean, cpu/hmc.py:132-138, generalized to unequal draw counts)."""
    import h5py

    sums: Dict[str, np.ndarray] = {}
    counts: Dict[str, int] = {}
    for p in paths:
        with h5py.File(p, "r") as f:
            for name in _walk(f):
                if name == "__chain_indices__":
                    continue
                arr = np.asarray(f[name])
                sums[name] = sums.get(name, 0.0) + arr.sum(axis=0)
                counts[name] = counts.get(name, 0) + arr.shape[0]
    return {k: sums[k] / counts[k] for k in sums}
