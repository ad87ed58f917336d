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

Precision scheme (bf16x3): Mosaic only lowers DEFAULT/HIGHEST matmul
precision, so the ~f32-accurate 3-pass bf16 decomposition XLA uses for
Precision.HIGH is spelled out with explicit bf16 MXU dots.  Crucially the
dataset X is split into its (hi, lo) bf16 pair ONCE, outside the kernel
(``split_bf16_input``) — X is constant across every leapfrog step of a
sampling run, so per-step in-kernel splitting of the largest tensor would be
pure VPU waste (measured: 3.2 -> ~1 ms/step at MNIST bench shapes).  The
total HBM traffic for X is unchanged (two bf16 halves = one f32).

Layout (everything 2-D — no reshapes/transposes inside the kernel, which
Mosaic would turn into relayouts):

  X_hi/X_lo  (N, D) bf16            row-tiled over the grid
  Y          (N, K) one-hot f32     row-tiled
  W2h/W2l    (D, K*C) bf16          chains folded into lanes: column k*C + c
                                    is class k of chain c (fold by the wrapper)
  b2         (1, K*C) f32

Per-class slices z[:, k*C:(k+1)*C] are contiguous (TB, C) lane blocks, so the
row-local softmax over K classes is K-1 elementwise max/add ops on (TB, C)
blocks — per-chain numerically stable (each chain subtracts its own max).
Both GEMMs run on the MXU with chains folded into the output lane dimension.

The kernel produces the LOG-LIKELIHOOD value (1, C) and gradients (D, K*C),
(1, K*C); the (cheap, elementwise) Gaussian-prior terms are added by the XLA
wrapper so they are exact f32 and fused by XLA.  End result matches
jax.value_and_grad of models.softmax.Softmax.log_posterior (reference
analytic form: /root/reference/hamiltonian/models/cpu/softmax.py:45-61).

Grid is 1-D over row tiles; accumulation across sequential grid steps happens
in the revisited output blocks — the standard TPU reduction pattern.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_DOT = jax.lax.Precision.DEFAULT


def _round_to_bf16_f32(a: jnp.ndarray) -> jnp.ndarray:
    """Round f32 to the bf16 grid (RNE) via integer mantissa masking,
    returning f32.  An astype round-trip would be folded away under
    --xla_allow_excess_precision (set in this environment), silently zeroing
    the lo term of the bf16x3 split; bit ops are opaque to that rewrite and
    Mosaic lowers them (lax.reduce_precision it does not)."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    rounded = bits + jnp.uint32(0x7FFF) + ((bits >> 16) & jnp.uint32(1))
    return jax.lax.bitcast_convert_type(rounded & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= a."""
    hi_f32 = _round_to_bf16_f32(a)
    lo = (a - hi_f32).astype(jnp.bfloat16)
    return hi_f32.astype(jnp.bfloat16), lo


def split_bf16_input(X: jnp.ndarray) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Precompute the (hi, lo) bf16 pair of a constant input ONCE (outside
    the sampling scan).  Same total bytes as the f32 original.

    When X is EXACTLY bf16-representable — e.g. MNIST pixels k/256 with
    k in 0..255 (8-bit data scaled by a power of two) — lo is identically
    zero; this returns (hi, None) and the kernel skips the Xl GEMM pass and
    its HBM stream entirely (one fewer MXU pass per leapfrog step)."""
    Xf = jnp.asarray(X, jnp.float32)
    hi, lo = _split_bf16(Xf)
    if not isinstance(Xf, jax.core.Tracer):
        if float(jnp.max(jnp.abs(lo.astype(jnp.float32)))) == 0.0:
            return hi, None
    return hi, lo


def _kernel(*refs, n_classes: int, bwd_3pass: bool, has_xlo: bool,
            fwd_full: bool):
    if has_xlo:
        (xh_ref, xl_ref, y_ref, wh_ref, wl_ref, b_ref, nvalid_ref,
         value_ref, gw_ref, gb_ref) = refs
    else:
        (xh_ref, y_ref, wh_ref, wl_ref, b_ref, nvalid_ref,
         value_ref, gw_ref, gb_ref) = refs
        xl_ref = None
    K = n_classes
    i = pl.program_id(0)
    TB = xh_ref.shape[0]
    D, CK = wh_ref.shape
    C = CK // K

    xh = xh_ref[:]                                 # (TB, D) bf16
    y = y_ref[:]                                   # (TB, K) f32

    # mask rows beyond the true dataset size (last-tile padding)
    row0 = i * TB
    rows = jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0) + row0
    valid = (rows < nvalid_ref[0]).astype(jnp.float32)   # (TB, 1)

    # forward GEMM at bf16x3 (~f32): the log-likelihood sums ~N*|logit|
    # magnitudes, so single-pass bf16 noise would swamp the MH energy delta.
    # With an exactly-representable X (has_xlo=False) the Xl pass vanishes
    # and 2 passes already give the full bf16x3 accuracy.  fwd_full=False
    # keeps ONLY the hi pass — grad-quality logits for grad-only leapfrog
    # steps (the returned ll is then bf16-noisy and must not feed an MH
    # accept; HMC evaluates the accurate value at trajectory ends only).
    wh = wh_ref[:]
    z = jnp.dot(xh, wh, precision=_DOT, preferred_element_type=jnp.float32)
    if fwd_full:
        z += jnp.dot(xh, wl_ref[:], precision=_DOT,
                     preferred_element_type=jnp.float32)
        if has_xlo:
            xl = xl_ref[:]                         # (TB, D) bf16
            z += jnp.dot(xl, wh, precision=_DOT,
                         preferred_element_type=jnp.float32)
    elif has_xlo:
        xl = xl_ref[:]
    z = z + b_ref[:]                               # (TB, K*C) f32

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
    r_hi, r_lo = _split_bf16(resid)
    gw = jax.lax.dot_general(xh, r_hi, dimension_numbers=dn,
                             precision=_DOT,
                             preferred_element_type=jnp.float32)
    if bwd_3pass:
        gw += jax.lax.dot_general(xh, r_lo, dimension_numbers=dn,
                                  precision=_DOT,
                                  preferred_element_type=jnp.float32)
        if has_xlo:
            gw += jax.lax.dot_general(xl, r_hi, dimension_numbers=dn,
                                      precision=_DOT,
                                      preferred_element_type=jnp.float32)
    gb = jnp.sum(resid, axis=0, keepdims=True)     # (1, K*C)

    @pl.when(i == 0)
    def _():
        value_ref[:] = jnp.zeros_like(value_ref)
        gw_ref[:] = jnp.zeros_like(gw_ref)
        gb_ref[:] = jnp.zeros_like(gb_ref)

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
    X: Optional[jnp.ndarray],  # (N, D) f32, or None when x_split is given
    Y: jnp.ndarray,            # (N, K) one-hot
    W: jnp.ndarray,            # (C, D, K)
    b: jnp.ndarray,            # (C, K)
    alpha: float,
    tile_rows: int = 512,
    interpret: bool = False,
    bwd_3pass: bool = False,
    x_split: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    fwd_full: bool = True,
    include_prior: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused log-posterior value + gradient for all chains in one X pass.

    Returns (value (C,), grad_W (C, D, K), grad_b (C, K)) in float32.
    The value is bf16x3 (~f32) accurate; gradients are single-pass bf16
    unless ``bwd_3pass``.  ``interpret=True`` runs the kernel in Pallas
    interpret mode (CPU-testable).  Pass ``x_split=split_bf16_input(X)``
    (precomputed once) to avoid re-splitting the dataset per call.
    ``fwd_full=False`` drops the forward correction passes (single-pass bf16
    logits): the gradient keeps grad quality but the returned value is too
    noisy for an MH accept — use only for grad-only leapfrog steps.
    ``include_prior=False`` returns the LIKELIHOOD-only value/grads — the
    data-parallel composition point: each shard runs the kernel on its local
    rows, the outputs psum over the data mesh axis, and the (replicated)
    prior is added exactly once outside the psum.
    """
    if x_split is None:
        x_split = split_bf16_input(X)
    Xh, Xl = x_split
    has_xlo = Xl is not None
    N, D = Xh.shape
    K = Y.shape[1]
    C = W.shape[0]
    n_tiles = pl.cdiv(N, tile_rows)
    N_pad = n_tiles * tile_rows
    if N_pad != N:
        Xh = jnp.pad(Xh, ((0, N_pad - N), (0, 0)))
        if has_xlo:
            Xl = jnp.pad(Xl, ((0, N_pad - N), (0, 0)))
        Y = jnp.pad(Y, ((0, N_pad - N), (0, 0)))

    W2, b2 = fold_chain_params(W, b)
    W2h, W2l = _split_bf16(W2)
    nvalid = jnp.asarray([N], jnp.int32)

    x_spec = pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [x_spec] + ([x_spec] if has_xlo else []) + [
        pl.BlockSpec((tile_rows, K), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D, K * C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D, K * C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K * C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs = ((Xh, Xl) if has_xlo else (Xh,)) + (Y, W2h, W2l, b2, nvalid)

    n_fwd = (3 if has_xlo else 2) if fwd_full else 1
    n_bwd = (3 if has_xlo else 2) if bwd_3pass else 1
    value, gw2, gb2 = pl.pallas_call(
        functools.partial(_kernel, n_classes=K, bwd_3pass=bwd_3pass,
                          has_xlo=has_xlo, fwd_full=fwd_full),
        grid=(n_tiles,),
        in_specs=in_specs,
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
            flops=(n_fwd + n_bwd) * 2 * N_pad * D * K * C,
            bytes_accessed=(2 if has_xlo else 1) * N_pad * D * 2
            + N_pad * K * 4 + 2 * C * D * K * 4,
            transcendentals=N_pad * C * K,
        ),
        interpret=interpret,
    )(*inputs)

    gw, gb = unfold_chain_grads(gw2, gb2, K)

    if not include_prior:
        return value[0], gw, gb

    # Gaussian-prior terms, exact f32, fused by XLA (elementwise, O(C*D*K))
    nparam = jnp.float32(D * K + K)
    sq = (jnp.sum(W * W, axis=(1, 2)) + jnp.sum(b * b, axis=1))   # (C,)
    value = (value[0]
             + 0.5 * nparam * jnp.log(alpha / (2.0 * jnp.pi))
             - 0.5 * alpha * sq)
    gw = gw - alpha * W
    gb = gb - alpha * b
    return value, gw, gb
