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


def plot_posterior_uncertainty(path, Xtr, ytr, post, pm):
    """The reference's visual deliverable (notebook 1 cell 12 / the
    hmc_mvn.png criterion): training blobs + the posterior-mean decision
    boundary + a spaghetti band of per-draw boundaries whose spread IS the
    posterior uncertainty.  Colors: the two classes take categorical slots
    1/2 (blue/orange — a colorblind-separable pair) with marker-shape
    secondary encoding; draw boundaries use a light step of the blue ramp
    so the mean boundary (dark ink) stays dominant."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    X = np.asarray(Xtr)
    y = np.asarray(ytr)
    W = np.asarray(post.positions["weights"]).reshape(-1, 2)
    B = np.asarray(post.positions["bias"]).reshape(-1)
    rng = np.random.default_rng(0)
    idx = rng.choice(W.shape[0], size=min(100, W.shape[0]), replace=False)

    fig, ax = plt.subplots(figsize=(6.4, 4.8), dpi=150)
    fig.patch.set_facecolor("#fcfcfb")
    ax.set_facecolor("#fcfcfb")
    xs = np.linspace(X[:, 0].min() - 0.5, X[:, 0].max() + 0.5, 2)

    def boundary(w, b):
        # w0*x + w1*y + b = 0 -> y = -(w0*x + b)/w1
        return -(w[0] * xs + b) / w[1]

    for i in idx:
        ax.plot(xs, boundary(W[i], B[i]), color="#86b6ef", lw=0.8,
                alpha=0.25, zorder=1)
    ax.plot(xs, boundary(np.asarray(pm["weights"]), float(pm["bias"])),
            color="#0b0b0b", lw=2.0, zorder=3, label="posterior mean")
    ax.plot([], [], color="#86b6ef", lw=2.0, alpha=0.7,
            label="posterior draws (100)")
    m0, m1 = y == 0, y == 1
    ax.scatter(X[m0, 0], X[m0, 1], s=14, c="#2a78d6", marker="o", lw=0,
               zorder=2, label="class 0")
    ax.scatter(X[m1, 0], X[m1, 1], s=16, c="#eb6834", marker="^", lw=0,
               zorder=2, label="class 1")
    pad = 0.5
    ax.set_xlim(X[:, 0].min() - pad, X[:, 0].max() + pad)
    ax.set_ylim(X[:, 1].min() - pad, X[:, 1].max() + pad)
    ax.set_title("Bayesian logistic regression: posterior uncertainty of "
                 "the decision boundary", color="#0b0b0b", fontsize=10)
    ax.set_xlabel("$x_1$", color="#52514e")
    ax.set_ylabel("$x_2$", color="#52514e")
    ax.tick_params(colors="#52514e", labelsize=8)
    for s in ax.spines.values():
        s.set_color("#d8d7d3")
    ax.legend(loc="upper left", fontsize=8, framealpha=0.9)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--plot", type=str, default=None, metavar="PNG",
                    help="write the posterior-uncertainty decision-boundary "
                         "plot (the reference notebook 1 cell 12 artifact)")
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

    if args.plot:
        plot_posterior_uncertainty(args.plot, Xtr, ytr, post, pm)

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
