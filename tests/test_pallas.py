"""Pallas fused GLM kernel + chain-batched HMC kernel tests.

The fused kernel (ops/pallas_glm.py) must match jax.value_and_grad of the
same log posterior exactly (same math, f32 accumulation); the chain-batched
leapfrog must match the vmapped per-chain leapfrog bit-for-bit given the same
inputs.  Interpret mode makes the kernel CPU-testable; on a real TPU backend
the compiled kernel is exercised too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropout_hamiltonian_montecarlo_tpu.models import Softmax
from dropout_hamiltonian_montecarlo_tpu.inference import hmc
from dropout_hamiltonian_montecarlo_tpu.ops.pallas_glm import (
    softmax_value_and_grad,
)
from dropout_hamiltonian_montecarlo_tpu.ops.integrators import (
    IntegratorState,
    velocity_verlet,
    velocity_verlet_batched,
)
from dropout_hamiltonian_montecarlo_tpu.ops.metrics import (
    batched_diagonal_metric,
    diagonal_metric,
)
from dropout_hamiltonian_montecarlo_tpu.ops.tree import (
    tree_ones_like,
    tree_randn_like,
)

N, D, K, C = 300, 32, 7, 5
ALPHA = 0.7


def _data(key):
    kx, ky, kw = jax.random.split(key, 3)
    X = jax.random.normal(kx, (N, D), jnp.float32)
    yi = jax.random.randint(ky, (N,), 0, K)
    Y = (yi[:, None] == jnp.arange(K)).astype(jnp.float32)
    W = 0.3 * jax.random.normal(kw, (C, D, K), jnp.float32)
    b = 0.1 * jax.random.normal(jax.random.fold_in(kw, 1), (C, K), jnp.float32)
    return X, Y, W, b


def _xla_vag(model, X, Y, precision=None):
    ld = model.make_logdensity(batch=(X, Y))
    f = jax.vmap(jax.value_and_grad(ld))
    if precision is None:
        return f

    def wrapped(params):
        with jax.default_matmul_precision(precision):
            return f(params)

    return wrapped


@pytest.mark.parametrize("tile_rows", [128, 256])
@pytest.mark.parametrize("bwd_3pass", [False, True])
def test_fused_value_and_grad_matches_xla(tile_rows, bwd_3pass):
    """Interpret-mode kernel == jax.value_and_grad, incl. ragged last tile.

    Values are always bf16x3 (~f32); gradients are exact-ish with
    bwd_3pass=True and ~bf16 (0.4% rel) with the fast single-pass default."""
    X, Y, W, b = _data(jax.random.key(0))
    model = Softmax(dim=D, n_classes=K, alpha=ALPHA)

    val, gw, gb = softmax_value_and_grad(
        X, Y, W, b, ALPHA, tile_rows=tile_rows, interpret=True,
        bwd_3pass=bwd_3pass,
    )
    # 'highest' reference: on TPU the DEFAULT f32 matmul is single-pass bf16,
    # noisier than the kernel's bf16x3 values
    ref_val, ref_grad = _xla_vag(model, X, Y, precision="highest")(
        {"weights": W, "bias": b}
    )

    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=3e-4)
    if bwd_3pass:
        g_rtol, g_atol_w, g_atol_b = 1e-3, 1e-3, 1e-3
    else:
        # single-pass bf16 backward: per-element error scales with the
        # ACCUMULATED magnitude (bf16 unit roundoff 2^-8 = 3.9e-3 of the
        # summed |x||r| products), not with the element's own value — a
        # near-cancelled gradient element can carry full-scale noise.  So
        # the honest bound is an atol proportional to the gradient scale.
        g_rtol = 2e-2
        g_atol_w = 3.9e-3 * float(np.abs(np.asarray(ref_grad["weights"])).max())
        g_atol_b = 3.9e-3 * float(np.abs(np.asarray(ref_grad["bias"])).max())
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ref_grad["weights"]),
                               rtol=g_rtol, atol=g_atol_w)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ref_grad["bias"]),
                               rtol=g_rtol, atol=g_atol_b)


def test_fused_value_and_grad_exact_x():
    """8-bit-style data (k/256) is exactly bf16-representable: split_bf16_input
    must detect it (lo is None -> the Xl GEMM pass is skipped) and the kernel
    must still match jax.value_and_grad to ~f32."""
    from dropout_hamiltonian_montecarlo_tpu.ops.pallas_glm import (
        split_bf16_input,
    )

    key = jax.random.key(8)
    X = jax.random.randint(key, (N, D), 0, 256).astype(jnp.float32) / 256.0
    _, Y, W, b = _data(jax.random.key(9))
    xs = split_bf16_input(X)
    assert xs[1] is None

    model = Softmax(dim=D, n_classes=K, alpha=ALPHA)
    val, gw, gb = softmax_value_and_grad(
        None, Y, W, b, ALPHA, tile_rows=128, interpret=True, bwd_3pass=True,
        x_split=xs,
    )
    ref_val, ref_grad = _xla_vag(model, X, Y, precision="highest")(
        {"weights": W, "bias": b}
    )
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ref_grad["weights"]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ref_grad["bias"]),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernel needs a TPU backend")
def test_fused_value_and_grad_compiled_tpu():
    X, Y, W, b = _data(jax.random.key(1))
    model = Softmax(dim=D, n_classes=K, alpha=ALPHA)

    val, gw, gb = jax.jit(
        lambda *a: softmax_value_and_grad(*a, ALPHA, tile_rows=128,
                                          bwd_3pass=True)
    )(X, Y, W, b)
    ref_val, ref_grad = _xla_vag(model, X, Y, precision="highest")(
        {"weights": W, "bias": b}
    )

    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ref_grad["weights"]),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ref_grad["bias"]),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernel needs a TPU backend")
@pytest.mark.parametrize("fwd_full", [True, False])
def test_fused_kernel_bench_shapes_vmem_fit(fwd_full):
    """BENCH-SHAPE compile smoke (VERDICT r2 item 6 / ADVICE r1 #1): one
    compiled call at the headline-bench shapes — N=60000, D=784, C=128 chains
    folded to 1280 lanes, tile_rows=512, 8-bit exact-X mode — for BOTH
    forward variants.  Guards the round-1 regression class (scoped-VMEM OOM
    at full scale that small-shape tests cannot see); asserts compile +
    finite outputs only."""
    from dropout_hamiltonian_montecarlo_tpu.ops.pallas_glm import (
        softmax_value_and_grad,
        split_bf16_input,
    )

    n, d, k, c = 60000, 784, 10, 128
    key = jax.random.key(12)
    kx, ky, kw = jax.random.split(key, 3)
    X = jax.random.randint(kx, (n, d), 0, 256).astype(jnp.float32) / 256.0
    yi = jax.random.randint(ky, (n,), 0, k)
    Y = (yi[:, None] == jnp.arange(k)).astype(jnp.float32)
    W = 0.01 * jax.random.normal(kw, (c, d, k), jnp.float32)
    b = jnp.zeros((c, k), jnp.float32)
    xs = split_bf16_input(X)
    assert xs[1] is None  # 8-bit grid -> exact bf16, Xl pass elided

    val, gw, gb = jax.jit(
        lambda W, b: softmax_value_and_grad(
            None, Y, W, b, ALPHA, tile_rows=512, x_split=xs,
            fwd_full=fwd_full)
    )(W, b)
    jax.block_until_ready(val)
    assert val.shape == (c,)
    assert bool(jnp.all(jnp.isfinite(val)))
    assert bool(jnp.all(jnp.isfinite(gw))) and gw.shape == (c, d, k)
    assert bool(jnp.all(jnp.isfinite(gb))) and gb.shape == (c, k)


def test_batched_leapfrog_matches_vmapped():
    """velocity_verlet_batched == vmap(velocity_verlet) on the same inputs."""
    X, Y, W, b = _data(jax.random.key(2))
    model = Softmax(dim=D, n_classes=K, alpha=ALPHA)
    ld = model.make_logdensity(batch=(X, Y))
    positions = {"weights": W, "bias": b}
    momenta = tree_randn_like(jax.random.key(3), positions)
    step_sizes = jnp.linspace(1e-3, 3e-3, C)

    # per-chain reference: vmapped single-chain verlet with unit mass
    def one(q, p, eps):
        m = diagonal_metric(tree_ones_like(q))
        integ = velocity_verlet(ld, m.kinetic_grad)
        v, g = jax.value_and_grad(ld)(q)
        out = integ(IntegratorState(q, p, v, g), eps)
        return out.position, out.momentum, out.logdensity

    ref_q, ref_p, ref_v = jax.vmap(one)(positions, momenta, step_sizes)

    # batched: one call over the chain-stacked pytree
    bvag = jax.vmap(jax.value_and_grad(ld))
    bm = batched_diagonal_metric(tree_ones_like(positions))
    binteg = velocity_verlet_batched(bvag, bm.kinetic_grad)
    v0, g0 = bvag(positions)
    out = binteg(IntegratorState(positions, momenta, v0, g0), step_sizes)

    np.testing.assert_allclose(np.asarray(out.logdensity), np.asarray(ref_v),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.position["weights"]),
                               np.asarray(ref_q["weights"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.momentum["bias"]),
                               np.asarray(ref_p["bias"]), rtol=1e-6,
                               atol=1e-6)


def test_batched_kernel_samples():
    """Chain-batched HMC kernel (XLA vag) mixes on a separable posterior:
    finite energies, reasonable acceptance, per-chain info shapes."""
    X, Y, W, b = _data(jax.random.key(4))
    model = Softmax(dim=D, n_classes=K, alpha=ALPHA)
    ld = model.make_logdensity(batch=(X, Y))
    bvag = jax.vmap(jax.value_and_grad(ld))

    positions = {"weights": 0.01 * W, "bias": 0.01 * b}
    state = hmc.batched_init(positions, bvag)
    kernel = hmc.build_batched_kernel(bvag, num_integration_steps=8)
    inv_mass = tree_ones_like(positions)
    step_sizes = jnp.full((C,), 5e-3, jnp.float32)

    def body(s, k):
        ns, info = kernel(k, s, step_sizes, inv_mass)
        return ns, info

    keys = jax.random.split(jax.random.key(5), 50)
    final, infos = jax.lax.scan(body, state, keys)

    assert infos.acceptance_prob.shape == (50, C)
    assert bool(jnp.all(jnp.isfinite(final.logdensity)))
    assert float(infos.acceptance_prob.mean()) > 0.5
    assert float(infos.is_accepted.mean()) > 0.3
    # chains actually moved
    assert float(jnp.abs(final.position["weights"] -
                         positions["weights"]).max()) > 1e-4


def test_fused_kernel_drives_batched_hmc_interpret():
    """End-to-end: Pallas (interpret) value+grad inside the batched kernel
    reproduces the XLA-vag batched kernel trajectory bit-for-bit-ish."""
    X, Y, W, b = _data(jax.random.key(6))
    model = Softmax(dim=D, n_classes=K, alpha=ALPHA)
    ld = model.make_logdensity(batch=(X, Y))

    fused = model.make_fused_value_and_grad((X, Y), tile_rows=128,
                                            interpret=True, bwd_3pass=True)
    _bvag = jax.vmap(jax.value_and_grad(ld))

    def bvag(params):
        # 'highest' so the XLA reference is at least as accurate as bf16x3
        with jax.default_matmul_precision("highest"):
            return _bvag(params)

    positions = {"weights": 0.1 * W, "bias": 0.1 * b}
    inv_mass = tree_ones_like(positions)
    step_sizes = jnp.full((C,), 2e-3, jnp.float32)
    keys = jax.random.split(jax.random.key(7), 10)

    def run(vag):
        state = hmc.batched_init(positions, vag)
        kernel = hmc.build_batched_kernel(vag, num_integration_steps=4)

        def body(s, k):
            ns, info = kernel(k, s, step_sizes, inv_mass)
            return ns, info.acceptance_prob

        final, acc = jax.lax.scan(body, state, keys)
        return final, acc

    f1, a1 = run(fused)
    f2, a2 = run(bvag)
    # bf16x3-vs-f32 energy noise moves acceptance probabilities a little;
    # positions only change when an accept decision flips (none at these
    # step sizes)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=5e-2)
    np.testing.assert_allclose(np.asarray(f1.position["weights"]),
                               np.asarray(f2.position["weights"]),
                               rtol=5e-3, atol=1e-3)


def test_lazy_value_kernel_matches_standard():
    """build_batched_kernel(grad_fn=...) with an EXACT grad_fn must reproduce
    the standard batched kernel up to XLA refusion noise (same keys, same
    math, only the evaluation schedule differs); with the cheap
    single-pass-forward grad (fwd_full=False) it must stay statistically
    indistinguishable (the endpoint energies are still accurate)."""
    X, Y, W, b = _data(jax.random.key(10))
    model = Softmax(dim=D, n_classes=K, alpha=ALPHA)
    vag = model.make_fused_value_and_grad((X, Y), tile_rows=128,
                                          interpret=True, bwd_3pass=True)
    cheap = model.make_fused_value_and_grad((X, Y), tile_rows=128,
                                            interpret=True, bwd_3pass=True,
                                            fwd_full=False)

    positions = {"weights": 0.1 * W, "bias": 0.1 * b}
    inv_mass = tree_ones_like(positions)
    step_sizes = jnp.full((C,), 2e-3, jnp.float32)
    keys = jax.random.split(jax.random.key(11), 8)

    def run(kernel):
        state = hmc.batched_init(positions, vag)

        def body(s, k):
            ns, info = kernel(k, s, step_sizes, inv_mass)
            return ns, info.acceptance_prob

        return jax.lax.scan(body, state, keys)

    k_std = hmc.build_batched_kernel(vag, num_integration_steps=4)
    k_lazy = hmc.build_batched_kernel(vag, num_integration_steps=4,
                                      grad_fn=vag)
    k_cheap = hmc.build_batched_kernel(vag, num_integration_steps=4,
                                       grad_fn=cheap)

    f_std, a_std = run(k_std)
    f_lazy, a_lazy = run(k_lazy)
    # same math, different program structure -> only refusion-level drift
    np.testing.assert_allclose(np.asarray(a_std), np.asarray(a_lazy),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(f_std.position["weights"]),
                               np.asarray(f_lazy.position["weights"]),
                               rtol=1e-4, atol=1e-5)

    f_cheap, a_cheap = run(k_cheap)
    np.testing.assert_allclose(np.asarray(a_cheap), np.asarray(a_std),
                               atol=0.05)
    assert bool(jnp.all(jnp.isfinite(f_cheap.logdensity)))


def test_fused_include_prior_false_data_parallel_composition():
    """include_prior=False is the data-parallel composition point: kernel on
    two disjoint row shards, outputs summed (the psum), prior added ONCE —
    must equal the single full-data include_prior=True call exactly (the
    prior terms are pure XLA f32 arithmetic outside the kernel)."""
    X, Y, W, b = _data(jax.random.key(4))
    model = Softmax(dim=D, n_classes=K, alpha=ALPHA)

    v_full, gw_full, gb_full = softmax_value_and_grad(
        X, Y, W, b, ALPHA, tile_rows=128, interpret=True, bwd_3pass=True)

    h = X.shape[0] // 2
    parts = [softmax_value_and_grad(
        X[i:j], Y[i:j], W, b, ALPHA, tile_rows=128, interpret=True,
        bwd_3pass=True, include_prior=False)
        for i, j in ((0, h), (h, X.shape[0]))]
    v = parts[0][0] + parts[1][0]
    gw = parts[0][1] + parts[1][1]
    gb = parts[0][2] + parts[1][2]
    # prior, exactly once (same closed form the wrapper adds)
    nparam = D * K + K
    sq = jnp.sum(W * W, axis=(1, 2)) + jnp.sum(b * b, axis=1)
    v = v + 0.5 * nparam * jnp.log(ALPHA / (2 * jnp.pi)) - 0.5 * ALPHA * sq
    gw = gw - ALPHA * W
    gb = gb - ALPHA * b

    np.testing.assert_allclose(np.asarray(v), np.asarray(v_full),
                               rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_full),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_full),
                               rtol=1e-4, atol=1e-4)
