"""Pallas TPU kernel: fused multi-chain softmax-GLM log-posterior + gradient.

The hot op of the flagship workload (SURVEY.md §3.1: one model.grad per
leapfrog step).  For Bayesian softmax regression the gradient is

    grad_W = X^T (Y - softmax(X W + b)) - alpha W        (per chain)

XLA evaluates this as two separate passes over X (forward logits GEMM, then
the backward X^T r GEMM), reading the dataset from HBM twice per leapfrog
step.  Because softmax is row-local, one row-tile pass suffices: for each tile
of rows compute logits -> softmax -> residual in VMEM and immediately
accumulate both the log-likelihood and X_tile^T @ residual.  This kernel does
that for ALL chains at once (chains live in VMEM; both GEMMs are MXU calls
with chains folded into the N dimension), halving HBM traffic for the
dominant array.

Layout: X (N, D) float32/bf16, Y one-hot (N, K), W (C, D, K), b (C, K).
Outputs: value (C,), grad_W (C, D, K), grad_b (C, K) — the value/grad of the
LOG POSTERIOR (prior included), matching jax.value_and_grad of
models.softmax.Softmax.log_posterior.

Grid is 1-D over row tiles; accumulation across sequential grid steps happens
in the (revisited) output blocks, the standard TPU reduction pattern.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, y_ref, w_ref, b_ref, alpha_ref, nvalid_ref,
            value_ref, gw_ref, gb_ref):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    C, D, K = w_ref.shape
    TB = x_ref.shape[0]

    x = x_ref[:]                                  # (TB, D)
    y = y_ref[:]                                  # (TB, K)

    # mask rows beyond the true dataset size (last tile padding)
    row0 = i * TB
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0) + row0
    valid = (row_ids < nvalid_ref[0]).astype(x.dtype)   # (TB, 1)
    y = y * valid                                 # zero padded rows

    w = w_ref[:].reshape(C * 1, D, K)             # (C, D, K)
    # forward: logits for all chains in one MXU call: (TB, D) @ (D, C*K)
    w2 = jnp.transpose(w, (1, 0, 2)).reshape(D, C * K)
    logits = jnp.dot(x, w2, preferred_element_type=jnp.float32)  # (TB, C*K)
    logits = logits.reshape(TB, C, K) + b_ref[:][None, :, :]

    # row-local stable log-softmax
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    logp = logits - lse                           # (TB, C, K)
    probs = jnp.exp(logp)

    # log-likelihood contribution per chain (padded rows: y==0 contributes 0)
    ll = jnp.sum(y[:, None, :] * logp, axis=(0, 2))          # (C,)

    resid = (y[:, None, :] - probs * valid[:, :, None])       # (TB, C, K)
    # backward: grad_W contribution: (D, TB) @ (TB, C*K)
    r2 = resid.reshape(TB, C * K)
    gw = jax.lax.dot_general(
        x, r2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # (D, C*K)
    gw = jnp.transpose(gw.reshape(D, C, K), (1, 0, 2))        # (C, D, K)
    gb = jnp.sum(resid, axis=0)                   # (C, K)

    @pl.when(i == 0)
    def _():
        # initialize with the prior terms (counted exactly once)
        alpha = alpha_ref[0]
        nparam = jnp.float32(D * K + K)
        w_f32 = w_ref[:].astype(jnp.float32)
        b_f32 = b_ref[:].astype(jnp.float32)
        sq = jnp.sum(w_f32 * w_f32, axis=(1, 2)) + jnp.sum(
            b_f32 * b_f32, axis=1
        )
        log_prior = (0.5 * nparam * jnp.log(alpha / (2.0 * jnp.pi))
                     - 0.5 * alpha * sq)
        value_ref[:] = log_prior
        gw_ref[:] = -alpha * w_f32
        gb_ref[:] = -alpha * b_f32

    value_ref[:] = value_ref[:] + ll
    gw_ref[:] = gw_ref[:] + gw
    gb_ref[:] = gb_ref[:] + gb


def softmax_value_and_grad(
    X: jnp.ndarray,          # (N, D)
    Y: jnp.ndarray,          # (N, K) one-hot
    W: jnp.ndarray,          # (C, D, K)
    b: jnp.ndarray,          # (C, K)
    alpha: float,
    tile_rows: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused log-posterior value + gradient for all chains in one X pass.

    Returns (value (C,), grad_W (C,D,K), grad_b (C,K)) in float32.
    """
    N, D = X.shape
    K = Y.shape[1]
    C = W.shape[0]
    n_tiles = pl.cdiv(N, tile_rows)
    N_pad = n_tiles * tile_rows
    if N_pad != N:
        X = jnp.pad(X, ((0, N_pad - N), (0, 0)))
        Y = jnp.pad(Y, ((0, N_pad - N), (0, 0)))

    alpha_arr = jnp.asarray([alpha], jnp.float32)
    nvalid = jnp.asarray([N], jnp.int32)

    value, gw, gb = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C,), jnp.float32),
            jax.ShapeDtypeStruct((C, D, K), jnp.float32),
            jax.ShapeDtypeStruct((C, K), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * N_pad * D * K * C,
            bytes_accessed=N_pad * D * X.dtype.itemsize + N_pad * K * 4
            + 2 * C * D * K * 4,
            transcendentals=N_pad * C * K,
        ),
    )(X, Y, W, b, alpha_arr, nvalid)
    return value, gw, gb
