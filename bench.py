"""Headline benchmark: effective samples/sec on the MNIST softmax posterior.

North-star metric (BASELINE.json): >= 1000 effective samples/s/chip for HMC on
the 10k-parameter (784x10+10) MNIST softmax model.  The reference's comparable
numbers (BASELINE.md): CPU HMC on a 3-param logistic took ~8-15 s/draw; MNIST
softmax was only ever run with SGD (24.3 s / 50 epochs) — full-batch HMC on
MNIST was computationally out of reach for it.

The dataset is passed as a jit ARGUMENT (never closed over): closure capture
would bake the 188 MB array into the compiled executable as a constant
(observed: 357 MB executable, 8-minute compile).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra detail goes to stderr.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


NUM_CHAINS = 16
NUM_WARMUP = 100
NUM_SAMPLES = 500
NUM_INTEGRATION_STEPS = 8


def _model():
    from dropout_hamiltonian_montecarlo_tpu.models import Softmax

    return Softmax(dim=784, n_classes=10, alpha=1.0)


_METRIC = None  # built once from X on the host; closed over (tiny arrays)


def _kernel(X, y):
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc

    model = _model()
    logdensity = model.make_logdensity(batch=(X, y))
    # Kronecker Gauss-Newton metric: isotropizes the GLM posterior so a
    # handful of leapfrog steps give near-iid draws (see ops/kron_metric.py).
    kernel = hmc.build_kernel(logdensity, NUM_INTEGRATION_STEPS,
                              metric=_METRIC)
    return model, logdensity, kernel


@jax.jit
def map_and_init(key, X, y):
    """Natural-gradient MAP (Newton for GLMs), then Laplace draws as chain
    starts — puts every chain inside the typical set before warmup."""
    from dropout_hamiltonian_montecarlo_tpu.ops.kron_metric import (
        natural_gradient_map,
    )

    model, logdensity, _ = _kernel(X, y)
    q0 = model.init_params(key)
    qmap = natural_gradient_map(logdensity, _METRIC, q0, num_steps=30)
    keys = jax.random.split(jax.random.fold_in(key, 1), NUM_CHAINS)
    positions = jax.vmap(lambda k: _METRIC.sample_position(k, qmap))(keys)
    return qmap, positions


@jax.jit
def warm(positions, keys, X, y):
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc
    from dropout_hamiltonian_montecarlo_tpu.inference.warmup import run_warmup

    _, logdensity, kernel = _kernel(X, y)

    def one(p, kk):
        state = hmc.init(p, logdensity)
        return run_warmup(kernel, state, kk, NUM_WARMUP,
                          initial_step_size=0.05)

    return jax.vmap(one)(positions, keys)


@jax.jit
def sample(states, step_sizes, inv_mass, keys, X, y):
    from dropout_hamiltonian_montecarlo_tpu.inference.base import run_inference

    _, _, kernel = _kernel(X, y)

    def one_chain(s, ss, im, kk):
        fixed = lambda k2, st: kernel(k2, st, ss, im)
        _, (sts, infos) = run_inference(fixed, s, kk, NUM_SAMPLES)
        return sts.position, infos

    return jax.vmap(one_chain)(states, step_sizes, inv_mass, keys)


def main():
    from dropout_hamiltonian_montecarlo_tpu.io import datasets
    from dropout_hamiltonian_montecarlo_tpu.diagnostics.ess import (
        effective_sample_size,
    )

    global _METRIC
    from dropout_hamiltonian_montecarlo_tpu.ops.kron_metric import (
        softmax_gauss_newton_metric,
    )

    t0 = time.time()
    X, yi = datasets.mnist()
    y = (yi[:, None] == jnp.arange(10)).astype(jnp.float32)
    X, y = jax.device_put(X), jax.device_put(y)
    jax.block_until_ready((X, y))
    model = _model()
    log(f"data: {X.shape} ({time.time() - t0:.1f}s); "
        f"params={784 * 10 + 10} chains={NUM_CHAINS}")

    t0 = time.time()
    _METRIC = softmax_gauss_newton_metric(np.asarray(X), 10, alpha=1.0)
    log(f"Gauss-Newton Kronecker metric built in {time.time() - t0:.1f}s")

    key = jax.random.key(0)
    t0 = time.time()
    qmap, positions = map_and_init(key, X, y)
    jax.block_until_ready(positions)
    log(f"MAP + Laplace chain init: {time.time() - t0:.1f}s")
    warm_keys = jax.random.split(jax.random.key(1), NUM_CHAINS)

    t0 = time.time()
    warmres = warm(positions, warm_keys, X, y)
    jax.block_until_ready(warmres.step_size)
    t_warm = time.time() - t0
    log(f"warmup: {t_warm:.1f}s; "
        f"step sizes {np.asarray(warmres.step_size).round(5)}")

    sample_keys = jax.random.split(jax.random.key(2), NUM_CHAINS)
    t0 = time.time()
    positions_out, infos = sample(warmres.state, warmres.step_size,
                                  warmres.inv_mass, sample_keys, X, y)
    jax.block_until_ready(positions_out)
    t_first = time.time() - t0
    log(f"sampling (incl compile): {t_first:.1f}s")

    t0 = time.time()
    positions_out, infos = sample(warmres.state, warmres.step_size,
                                  warmres.inv_mass, sample_keys, X, y)
    jax.block_until_ready(positions_out)
    t_sample = time.time() - t0

    accept = float(np.asarray(infos.acceptance_prob).mean())
    div = float(np.asarray(infos.is_divergent).mean())
    log(f"sampling: {t_sample:.2f}s for {NUM_CHAINS}x{NUM_SAMPLES} draws; "
        f"accept={accept:.3f} divergent={div:.4f}")

    ess_w = np.asarray(
        effective_sample_size(positions_out["weights"])).ravel()
    ess_b = np.asarray(effective_sample_size(positions_out["bias"])).ravel()
    ess = np.concatenate([ess_w, ess_b])
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
