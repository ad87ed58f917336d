"""Pallas TPU kernel: fused multi-chain softmax-GLM log-posterior + gradient.

The hot op of the flagship workload (SURVEY.md §3.1: one model.grad per
leapfrog step).  For Bayesian softmax regression the log-posterior gradient is

    grad_W = X^T (Y - softmax(X W + b)) - alpha W        (per chain)

XLA (even with vmapped chains batched into one GEMM) makes TWO passes over the
dataset per leapfrog step — the forward logits GEMM and the backward X^T r
GEMM — and round-trips the (N, C, K) probabilities through HBM as an autodiff
residual.  Because softmax is row-local, one row-tile pass suffices: for each
tile of rows compute logits -> softmax -> residual in VMEM and immediately
accumulate both the log-likelihood and X_tile^T @ residual.  This kernel does
that for ALL chains at once, reading X exactly once per value+grad.

Layout (everything 2-D — no reshapes/transposes inside the kernel, which
Mosaic would turn into relayouts):

  X   (N, D)                      row-tiled over the grid
  Y   (N, K) one-hot              row-tiled
  W2  (D, K*C)                    chains folded into lanes: column k*C + c is
                                  class k of chain c (fold done by the wrapper)
  b2  (1, K*C)

Per-class slices z[:, k*C:(k+1)*C] are contiguous (TB, C) lane blocks, so the
row-local softmax over K classes is K-1 elementwise max/add ops on (TB, C)
blocks — per-chain numerically stable (each chain subtracts its own max).
Both GEMMs run on the MXU with chains folded into the output lane dimension.

Outputs: value (1, C), grad_W2 (D, K*C), grad_b2 (1, K*C) — value/grad of the
LOG POSTERIOR (Gaussian prior included), matching jax.value_and_grad of
models.softmax.Softmax.log_posterior (reference analytic form:
/root/reference/hamiltonian/models/cpu/softmax.py:45-61).

Grid is 1-D over row tiles; accumulation across sequential grid steps happens
in the revisited output blocks — the standard TPU reduction pattern.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_DOT = jax.lax.Precision.DEFAULT


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= a (the bf16x3 decomposition
    XLA uses for Precision.HIGH — Mosaic only lowers DEFAULT/HIGHEST, so the
    3-pass scheme is spelled out here with explicit bf16 MXU dots)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_bf16x3(a, b):
    """~f32-accurate matmul in 3 bf16 MXU passes: hi@hi + hi@lo + lo@hi."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    acc = jnp.dot(a_hi, b_hi, precision=_DOT,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(a_hi, b_lo, precision=_DOT,
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(a_lo, b_hi, precision=_DOT,
                   preferred_element_type=jnp.float32)
    return acc


def _kernel(x_ref, y_ref, w_ref, b_ref, alpha_ref, nvalid_ref,
            value_ref, gw_ref, gb_ref, *, n_classes: int, bwd_3pass: bool):
    K = n_classes
    i = pl.program_id(0)
    TB = x_ref.shape[0]
    D, CK = w_ref.shape
    C = CK // K

    x = x_ref[:]                                   # (TB, D)
    y = y_ref[:]                                   # (TB, K)

    # mask rows beyond the true dataset size (last-tile padding)
    row0 = i * TB
    rows = jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0) + row0
    valid = (rows < nvalid_ref[0]).astype(jnp.float32)   # (TB, 1)

    # forward GEMM at bf16x3: the log-likelihood sums ~N*|logit| magnitudes,
    # so single-pass bf16 noise would swamp the MH energy delta (PERF_NOTES)
    z = _dot_bf16x3(x, w_ref[:])
    z = z + b_ref[:]                               # (TB, K*C)

    # per-(row, chain) stable softmax over the K contiguous (TB, C) blocks
    blocks = [z[:, k * C:(k + 1) * C] for k in range(K)]
    m = blocks[0]
    for bk in blocks[1:]:
        m = jnp.maximum(m, bk)                     # (TB, C) per-chain row max
    es = [jnp.exp(bk - m) for bk in blocks]
    ssum = es[0]
    for ek in es[1:]:
        ssum = ssum + ek
    lse = m + jnp.log(ssum)                        # (TB, C)
    inv = 1.0 / ssum

    ll_acc = jnp.zeros_like(m)                     # (TB, C)
    resid_blocks = []
    for k in range(K):
        yk = y[:, k:k + 1] * valid                 # (TB, 1), padded rows -> 0
        ll_acc = ll_acc + yk * (blocks[k] - lse)
        resid_blocks.append(yk - es[k] * inv * valid)
    resid = jnp.concatenate(resid_blocks, axis=1)  # (TB, K*C)

    ll = jnp.sum(ll_acc, axis=0, keepdims=True)    # (1, C)

    # backward GEMM fused into the same pass: (D, TB) @ (TB, K*C).
    # Gradient noise only perturbs leapfrog proposals (MH accepts on the
    # f32-accurate energies above), so single-pass bf16 is the default;
    # bwd_3pass=True gives ~f32 gradients at 2 extra MXU passes.
    dn = (((0,), (0,)), ((), ()))
    x_hi, x_lo = _split_bf16(x)
    r_hi, r_lo = _split_bf16(resid)
    gw = jax.lax.dot_general(x_hi, r_hi, dimension_numbers=dn,
                             precision=_DOT,
                             preferred_element_type=jnp.float32)
    if bwd_3pass:
        gw += jax.lax.dot_general(x_hi, r_lo, dimension_numbers=dn,
                                  precision=_DOT,
                                  preferred_element_type=jnp.float32)
        gw += jax.lax.dot_general(x_lo, r_hi, dimension_numbers=dn,
                                  precision=_DOT,
                                  preferred_element_type=jnp.float32)
    gb = jnp.sum(resid, axis=0, keepdims=True)     # (1, K*C)

    @pl.when(i == 0)
    def _():
        # initialize outputs with the prior terms (counted exactly once)
        alpha = alpha_ref[0]
        w = w_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        colsq = jnp.sum(w * w, axis=0, keepdims=True) + b * b   # (1, K*C)
        sq = colsq[:, 0:C]
        for k in range(1, K):
            sq = sq + colsq[:, k * C:(k + 1) * C]               # (1, C)
        nparam = jnp.float32(D * K + K)
        value_ref[:] = (0.5 * nparam * jnp.log(alpha / (2.0 * jnp.pi))
                        - 0.5 * alpha * sq)
        gw_ref[:] = -alpha * w
        gb_ref[:] = -alpha * b

    value_ref[:] = value_ref[:] + ll
    gw_ref[:] = gw_ref[:] + gw
    gb_ref[:] = gb_ref[:] + gb


def fold_chain_params(W: jnp.ndarray, b: jnp.ndarray):
    """(C, D, K), (C, K) -> (D, K*C), (1, K*C) kernel layout."""
    C, D, K = W.shape
    W2 = jnp.transpose(W, (1, 2, 0)).reshape(D, K * C)
    b2 = jnp.transpose(b, (1, 0)).reshape(1, K * C)
    return W2, b2


def unfold_chain_grads(gw2: jnp.ndarray, gb2: jnp.ndarray, n_classes: int):
    """(D, K*C), (1, K*C) -> (C, D, K), (C, K)."""
    D, CK = gw2.shape
    K = n_classes
    C = CK // K
    gw = jnp.transpose(gw2.reshape(D, K, C), (2, 0, 1))
    gb = jnp.transpose(gb2.reshape(K, C), (1, 0))
    return gw, gb


def softmax_value_and_grad(
    X: jnp.ndarray,          # (N, D)
    Y: jnp.ndarray,          # (N, K) one-hot
    W: jnp.ndarray,          # (C, D, K)
    b: jnp.ndarray,          # (C, K)
    alpha: float,
    tile_rows: int = 1024,
    interpret: bool = False,
    bwd_3pass: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused log-posterior value + gradient for all chains in one X pass.

    Returns (value (C,), grad_W (C, D, K), grad_b (C, K)) in float32.
    The value is bf16x3 (~f32) accurate; gradients are single-pass bf16
    unless ``bwd_3pass``.  ``interpret=True`` runs the kernel in Pallas
    interpret mode (CPU-testable).
    """
    N, D = X.shape
    K = Y.shape[1]
    C = W.shape[0]
    n_tiles = pl.cdiv(N, tile_rows)
    N_pad = n_tiles * tile_rows
    if N_pad != N:
        X = jnp.pad(X, ((0, N_pad - N), (0, 0)))
        Y = jnp.pad(Y, ((0, N_pad - N), (0, 0)))

    W2, b2 = fold_chain_params(W, b)
    alpha_arr = jnp.asarray([alpha], jnp.float32)
    nvalid = jnp.asarray([N], jnp.int32)

    value, gw2, gb2 = pl.pallas_call(
        functools.partial(_kernel, n_classes=K, bwd_3pass=bwd_3pass),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((D, K * C), jnp.float32),
            jax.ShapeDtypeStruct((1, K * C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * N_pad * D * K * C,
            bytes_accessed=N_pad * D * X.dtype.itemsize + N_pad * K * 4
            + 2 * C * D * K * 4,
            transcendentals=N_pad * C * K,
        ),
        interpret=interpret,
    )(X, Y, W2, b2, alpha_arr, nvalid)

    gw, gb = unfold_chain_grads(gw2, gb2, K)
    return value[0], gw, gb
