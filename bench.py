"""Headline benchmark: effective samples/sec on the MNIST softmax posterior.

North-star metric (BASELINE.json): >= 1000 effective samples/s/chip for HMC on
the 10k-parameter (784x10+10) MNIST softmax model.  The reference's comparable
numbers (BASELINE.md): CPU HMC on a 3-param logistic took ~8-15 s/draw; MNIST
softmax was only ever run with SGD (24.3 s / 50 epochs) — full-batch HMC on
MNIST was computationally out of reach for it.

Pipeline (see ops/kron_metric.py for the math):
  1. Kronecker Gauss-Newton metric at the uniform Fisher -> natural-gradient
     (Newton) MAP.
  2. Metric refreshed with the empirical Fisher AT the MAP (K-FAC) — tracks
     the true posterior curvature.
  3. HMC runs in WHITENED coordinates e = M^{1/2}(q - qmap): the posterior is
     near N(0, I) there, every array is O(1) in float32 (no mixed scales),
     and warmup's diagonal mass adaptation absorbs residual anisotropy.
  4. Draws map back to parameter space on-device; ESS is computed per
     parameter coordinate in PARAMETER space.

Transfer rules for the tunneled TPU (observed ~1 MB/s D2H): the dataset is a
jit ARGUMENT (never closed over — closure capture bakes 188 MB into the
executable), and no (n, D) array ever crosses device->host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra detail goes to stderr.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# 3-pass bf16 (~float32-accurate) matmuls: the TPU default single-pass bf16
# puts O(10) noise into the |logdensity| ~ 1e5 sum (0.4% per logit), which
# swamps the MH energy delta and collapses dual averaging (observed: step
# size -> 1e-4, ESS -> 8).  "high" halves the GEMM cost vs "highest" with no
# measurable ESS difference (see PERF_NOTES.md).
jax.config.update("jax_default_matmul_precision", "high")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


NUM_CHAINS = 16
NUM_WARMUP = 300
NUM_SAMPLES = 1000
NUM_INTEGRATION_STEPS = 12   # fixed-length: jitter halves mean trajectory
TARGET_ACCEPT = 0.65         # d^(-1/4) regime: bigger steps beat 0.8 here
ALPHA = 1.0


def main():
    from dropout_hamiltonian_montecarlo_tpu.models import Softmax
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc
    from dropout_hamiltonian_montecarlo_tpu.inference.base import run_inference
    from dropout_hamiltonian_montecarlo_tpu.inference.warmup import run_warmup
    from dropout_hamiltonian_montecarlo_tpu.io import datasets
    from dropout_hamiltonian_montecarlo_tpu.diagnostics.ess import (
        effective_sample_size,
    )
    from dropout_hamiltonian_montecarlo_tpu.ops.kron_metric import (
        gram_eigh,
        natural_gradient_map,
        softmax_gauss_newton_metric,
    )
    from dropout_hamiltonian_montecarlo_tpu.ops.tree import tree_add

    t0 = time.time()
    X, yi = datasets.mnist()
    y = (yi[:, None] == jnp.arange(10)).astype(jnp.float32)
    X, y = jax.device_put(X), jax.device_put(y)
    jax.block_until_ready((X, y))
    model = Softmax(dim=784, n_classes=10, alpha=ALPHA)
    log(f"data: {X.shape} ({time.time() - t0:.1f}s); "
        f"params={784 * 10 + 10} chains={NUM_CHAINS}")

    # --- metric stage 1: uniform-Fisher Kronecker metric -> Newton MAP ---
    t0 = time.time()
    gram = gram_eigh(X)
    metric0 = softmax_gauss_newton_metric(X, 10, alpha=ALPHA, gram=gram)
    log(f"Gram eigh: {time.time() - t0:.1f}s")

    logdensity = model.make_logdensity(batch=(X, y))
    t0 = time.time()

    @jax.jit
    def map_stage1(key):
        q0 = model.init_params(key)
        qmap = natural_gradient_map(logdensity, metric0, q0, num_steps=60)
        return qmap, model.predict(qmap, X, prob=True)

    qmap, probs = map_stage1(jax.random.key(0))
    jax.block_until_ready(qmap)
    acc = float((model.predict(qmap, X) == yi).mean())
    log(f"MAP (uniform-Fisher Newton): {time.time() - t0:.1f}s; "
        f"train acc {acc:.4f}")

    # Refresh the metric with the empirical Fisher AT the MAP (K-FAC) for
    # SAMPLING only.  (Running more Newton steps under this metric diverges:
    # confident probs make the Fisher factor small, so M^-1 overshoots in
    # directions where K-FAC underestimates the true curvature.)
    t0 = time.time()
    metric = softmax_gauss_newton_metric(X, 10, alpha=ALPHA, gram=gram,
                                         probs=probs)
    log(f"metric refresh @ MAP Fisher: {time.time() - t0:.1f}s")

    # --- whitened-space HMC: e = M^{1/2}(q - qmap), posterior ~ N(0, I) ---
    def logdensity_e(e):
        return logdensity(tree_add(qmap, metric.unwhiten(e)))

    kernel = hmc.build_kernel(logdensity_e, NUM_INTEGRATION_STEPS,
                              jitter_steps=False)

    @jax.jit
    def warm(key):
        e_keys = jax.random.split(jax.random.fold_in(key, 0), NUM_CHAINS)
        w_keys = jax.random.split(jax.random.fold_in(key, 1), NUM_CHAINS)

        def one(ke, kw):
            # Laplace init is exactly e ~ N(0, I) in whitened coordinates
            e0 = {
                "weights": jax.random.normal(ke, (784, 10), jnp.float32),
                "bias": jax.random.normal(jax.random.fold_in(ke, 1), (10,),
                                          jnp.float32),
            }
            state = hmc.init(e0, logdensity_e)
            # adapt_mass=False: the Kronecker metric already whitens; Welford
            # variance from short unmixed windows only degrades the scale
            return run_warmup(kernel, state, kw, NUM_WARMUP,
                              initial_step_size=0.1,
                              target_acceptance=TARGET_ACCEPT,
                              adapt_mass=False)

        return jax.vmap(one)(e_keys, w_keys)

    t0 = time.time()
    warmres = warm(jax.random.key(1))
    jax.block_until_ready(warmres.step_size)
    log(f"warmup ({NUM_WARMUP} steps, incl compile): {time.time() - t0:.1f}s; "
        f"step sizes {np.asarray(warmres.step_size).round(4)}")

    # --- sampling: Pallas chain-batched kernel (one dataset pass per
    # leapfrog step for ALL chains, ops/pallas_glm.py) on TPU; vmapped XLA
    # path elsewhere / with BENCH_PALLAS=0 ---
    use_pallas = (jax.default_backend() == "tpu"
                  and os.environ.get("BENCH_PALLAS", "1") == "1")
    log(f"sampling path: {'pallas fused batched' if use_pallas else 'xla vmapped'}")

    if use_pallas:
        fused_q = model.make_fused_value_and_grad((X, y))
        e_example = {
            "weights": jnp.zeros((784, 10), jnp.float32),
            "bias": jnp.zeros((10,), jnp.float32),
        }
        # grad of e -> logpost(qmap + unwhiten(e)) chains through the linear
        # unwhiten map's transpose (exact, XLA-compiled)
        unwhiten_t = jax.linear_transpose(metric.unwhiten, e_example)

        def fused_vag_e(E):
            dQ = jax.vmap(metric.unwhiten)(E)
            Q = jax.tree_util.tree_map(lambda m_, d: m_[None] + d, qmap, dQ)
            val, G = fused_q(Q)
            gE = jax.vmap(lambda g: unwhiten_t(g)[0])(G)
            return val, gE

        kernel_b = hmc.build_batched_kernel(fused_vag_e,
                                            NUM_INTEGRATION_STEPS)

        @jax.jit
        def sample(states, step_sizes, inv_mass, key):
            st = hmc.batched_init(states.position, fused_vag_e)
            keys = jax.random.split(key, NUM_SAMPLES)

            def body(s, k):
                ns, info = kernel_b(k, s, step_sizes, inv_mass)
                return ns, (ns.position, info)

            _, (pos, infos) = jax.lax.scan(body, st, keys)
            # (T, C, ...) -> (C, T, ...) to match the vmapped layout
            swap = lambda x: jnp.swapaxes(x, 0, 1)
            return (jax.tree_util.tree_map(swap, pos),
                    jax.tree_util.tree_map(swap, infos))
    else:
        @jax.jit
        def sample(states, step_sizes, inv_mass, key):
            keys = jax.random.split(key, NUM_CHAINS)

            def one_chain(s, ss, im, kk):
                fixed = lambda k2, st: kernel(k2, st, ss, im)
                _, (sts, infos) = run_inference(fixed, s, kk, NUM_SAMPLES)
                return sts.position, infos

            return jax.vmap(one_chain)(states, step_sizes, inv_mass, keys)

    @jax.jit
    def ess_of(e_draws):
        # back to parameter space (on device), ESS per parameter coordinate
        q_draws = jax.vmap(jax.vmap(
            lambda e: tree_add(qmap, metric.unwhiten(e))))(e_draws)
        return jnp.concatenate([
            effective_sample_size(q_draws["weights"]).ravel(),
            effective_sample_size(q_draws["bias"]).ravel(),
        ])

    t0 = time.time()
    e_draws, infos = sample(warmres.state, warmres.step_size,
                            warmres.inv_mass, jax.random.key(2))
    jax.block_until_ready(e_draws["bias"])
    log(f"sampling (incl compile): {time.time() - t0:.1f}s")

    t0 = time.time()
    e_draws, infos = sample(warmres.state, warmres.step_size,
                            warmres.inv_mass, jax.random.key(3))
    jax.block_until_ready(e_draws["bias"])
    t_sample = time.time() - t0
    ess = ess_of(e_draws)
    jax.block_until_ready(ess)

    accept = float(np.asarray(infos.acceptance_prob).mean())
    div = float(np.asarray(infos.is_divergent).mean())
    log(f"sampling+ESS: {t_sample:.2f}s for {NUM_CHAINS}x{NUM_SAMPLES} draws; "
        f"accept={accept:.3f} divergent={div:.4f}")

    ess = np.asarray(ess)
    med_ess, min_ess = float(np.median(ess)), float(np.min(ess))
    ess_per_sec = med_ess / t_sample
    log(f"ESS: median={med_ess:.0f} min={min_ess:.0f} "
        f"median ESS/s={ess_per_sec:.0f} min ESS/s={min_ess / t_sample:.0f}")

    print(json.dumps({
        "metric": "median_ess_per_sec_mnist_softmax_hmc",
        "value": round(ess_per_sec, 1),
        "unit": "eff_samples/s/chip",
        "vs_baseline": round(ess_per_sec / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
