"""Benchmark 1: simulated 2-D blobs — SGD then HMC logistic regression.

Parity with /root/reference/benchmarks/1.-Simulated_data.ipynb (cells 2, 6,
10, 12): train/test blobs, momentum-SGD baseline accuracy, HMC posterior with
dual averaging, posterior-predictive uncertainty of the decision boundary.
The reference took ~19 min of burn-in + ~3 h for 1000 draws on CPU
(BASELINE.md); this runs in seconds.

Usage: python benchmarks/simulated_data.py [--chains 32]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.models import Logistic
from dropout_hamiltonian_montecarlo_tpu.inference import hmc, sgd
from dropout_hamiltonian_montecarlo_tpu.inference.sampling import (
    init_chain_positions,
    sample_posterior,
)
from dropout_hamiltonian_montecarlo_tpu.diagnostics import summarize
from dropout_hamiltonian_montecarlo_tpu.io import datasets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--warmup", type=int, default=500)
    args = ap.parse_args()

    (Xtr, ytr), (Xte, yte) = datasets.blobs(n=1000)
    model = Logistic(dim=2, alpha=0.1)

    # --- SGD baseline (reference cell 6: ~7.7s, accuracy 1.00) --------------
    logdensity_b = model.make_batched_logdensity(data_size=Xtr.shape[0])
    kernel_sgd = sgd.build_sgd_kernel(logdensity_b, gamma=0.9)
    state = sgd.sgd_init(model.init_params(jax.random.key(0)))
    t0 = time.time()
    state, losses = sgd.fit(kernel_sgd, state, jax.random.key(1), (Xtr, ytr),
                            batch_size=50, num_steps=10_000, step_size=1e-3)
    jax.block_until_ready(state.position)
    t_sgd = time.time() - t0
    acc_sgd = float(jnp.mean(
        (model.predict(state.position, Xte) == yte).astype(jnp.float32)))

    # --- HMC posterior (reference cell 10) ----------------------------------
    logdensity = model.make_logdensity(batch=(Xtr, ytr))
    kernel = hmc.build_kernel(logdensity, num_integration_steps=16)
    init_fn = lambda p: hmc.init(p, logdensity)
    positions = init_chain_positions(model.init_params, jax.random.key(2),
                                     args.chains, jitter=0.5)
    t0 = time.time()
    post = sample_posterior(init_fn, kernel, positions, jax.random.key(3),
                            num_samples=args.samples, num_warmup=args.warmup,
                            num_chains=args.chains, initial_step_size=0.1)
    jax.block_until_ready(post.positions)
    t_hmc = time.time() - t0

    # posterior-mean prediction (reference reaches ~1.00)
    pm = jax.tree_util.tree_map(lambda x: x.mean(axis=(0, 1)), post.positions)
    acc_hmc = float(jnp.mean(
        (model.predict(pm, Xte) == yte).astype(jnp.float32)))

    # posterior-predictive uncertainty (reference cell 12's uncertainty band):
    # per-draw predicted probability spread on test points
    W = post.positions["weights"].reshape(-1, 2)
    B = post.positions["bias"].reshape(-1)
    probs = jax.nn.sigmoid(Xte @ W.T + B[None, :])   # (n_test, draws)
    band = jnp.percentile(probs, jnp.array([5.0, 95.0]), axis=1)
    mean_band_width = float(jnp.mean(band[1] - band[0]))

    s = summarize(post.positions, elapsed_seconds=t_hmc)
    print(json.dumps({
        "workload": "simulated_data",
        "sgd_seconds": round(t_sgd, 2),
        "sgd_test_accuracy": acc_sgd,
        "hmc_seconds": round(t_hmc, 2),
        "hmc_test_accuracy": acc_hmc,
        "hmc_min_ess": float(s["aggregate"]["min_ess"]),
        "hmc_max_rhat": float(s["aggregate"]["max_rhat"]),
        "mean_90pct_band_width": mean_band_width,
        "draws_per_sec": round(args.chains * args.samples / t_hmc, 1),
    }))


if __name__ == "__main__":
    main()
