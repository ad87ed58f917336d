"""Benchmark 2: MNIST softmax regression — SGD baseline then SG-MCMC posterior.

Parity with /root/reference/benchmarks/2.-MNIST.ipynb (cells 2, 3, 5): HDF5
MNIST (or the synthetic stand-in), 50-epoch SGD baseline (reference: 24.33 s,
0.74 accuracy on CPU), then multi-chain SGLD posterior with posterior-mean
prediction (the reference ran 4 multiprocessing workers; chains here are a
vmapped axis).

Usage: python benchmarks/mnist_softmax.py [--data mnist_train.h5]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dropout_hamiltonian_montecarlo_tpu.models import Softmax
from dropout_hamiltonian_montecarlo_tpu.inference import sgd, sgmcmc
from dropout_hamiltonian_montecarlo_tpu.io import datasets
from dropout_hamiltonian_montecarlo_tpu.utils import one_hot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    X, yi = datasets.mnist(args.data)
    y = one_hot(yi, 10)
    n = X.shape[0]
    steps_per_epoch = n // args.batch_size
    model = Softmax(dim=X.shape[1], n_classes=10, alpha=1.0)
    logdensity = model.make_batched_logdensity(data_size=n)

    # --- SGD baseline (reference cell 3: 24.33s / 50 epochs, acc 0.74) ------
    kernel_sgd = sgd.build_sgd_kernel(logdensity, gamma=0.9)
    state = sgd.sgd_init(model.init_params(jax.random.key(0)))
    t0 = time.time()
    state, _ = sgd.fit(kernel_sgd, state, jax.random.key(1), (X, y),
                       batch_size=args.batch_size,
                       num_steps=args.epochs * steps_per_epoch,
                       step_size=1e-6)
    jax.block_until_ready(state.position)
    t_sgd = time.time() - t0
    acc_sgd = float(jnp.mean(
        (model.predict(state.position, X) == yi).astype(jnp.float32)))

    # --- multi-chain SGLD posterior (reference cell 5, ncores=4) ------------
    kernel = sgmcmc.build_sgld_kernel(logdensity)
    states = jax.vmap(
        lambda k: sgmcmc.sgld_init(model.init_params(k))
    )(jax.random.split(jax.random.key(2), args.chains))
    t0 = time.time()
    _, positions, _ = sgmcmc.run_sgmcmc_chains(
        kernel, states, jax.random.key(3), args.chains, (X, y),
        batch_size=args.batch_size,
        num_steps=args.epochs * steps_per_epoch,
        step_size_schedule=sgmcmc.inverse_time_decay(1e-6),
        collect_every=steps_per_epoch,  # one draw per epoch, like the reference
        burnin_steps=10 * steps_per_epoch,
    )
    jax.block_until_ready(positions)
    t_sgld = time.time() - t0

    pm = jax.tree_util.tree_map(lambda x: x.mean(axis=(0, 1)), positions)
    acc_sgld = float(jnp.mean((model.predict(pm, X) == yi).astype(jnp.float32)))

    print(json.dumps({
        "workload": "mnist_softmax",
        "sgd_seconds": round(t_sgd, 2),
        "sgd_train_accuracy": acc_sgd,
        "sgld_seconds": round(t_sgld, 2),
        "sgld_chains": args.chains,
        "sgld_train_accuracy": acc_sgld,
        "reference_sgd_seconds": 24.33,
        "reference_sgd_accuracy": 0.74,
    }))


if __name__ == "__main__":
    main()
