"""I/O tests: HDF5 sample backend round trip + aggregation, checkpoint/resume
actually resumes (the reference never reads its files back, SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropout_hamiltonian_montecarlo_tpu.io import (
    HDF5Backend,
    load_checkpoint,
    posterior_mean,
    save_checkpoint,
)
from dropout_hamiltonian_montecarlo_tpu.io import datasets


def test_hdf5_backend_append_and_read(tmp_path):
    path = str(tmp_path / "samples.h5")
    block1 = {"weights": np.ones((5, 3, 2), np.float32),
              "bias": np.zeros((5, 2), np.float32)}
    block2 = {"weights": 2 * np.ones((3, 3, 2), np.float32),
              "bias": np.ones((3, 2), np.float32)}
    with HDF5Backend(path) as b:
        b.append(block1)
        b.append(block2)
    with HDF5Backend(path, "r") as b:
        data = b.read()
    assert data["weights"].shape == (8, 3, 2)
    assert np.allclose(data["weights"][:5], 1.0)
    assert np.allclose(data["weights"][5:], 2.0)


def test_posterior_mean_across_files(tmp_path):
    """Parity with the reference's backend_mean (cpu/hmc.py:132-138)."""
    p1, p2 = str(tmp_path / "b0.h5"), str(tmp_path / "b1.h5")
    with HDF5Backend(p1) as b:
        b.append({"x": np.full((4, 2), 1.0, np.float32)})
    with HDF5Backend(p2) as b:
        b.append({"x": np.full((12, 2), 3.0, np.float32)})
    mean = posterior_mean([p1, p2])
    # weighted by draw count: (4*1 + 12*3)/16 = 2.5
    assert np.allclose(mean["x"], 2.5)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    state = {"pos": jnp.arange(6.0).reshape(2, 3), "logp": jnp.float32(-1.5)}
    extras = {"adapt": {"step_size": jnp.float32(0.1)}}
    key = jax.random.key(99)
    save_checkpoint(path, state, key=key, step=42, extras=extras)

    template = {"pos": jnp.zeros((2, 3)), "logp": jnp.float32(0.0)}
    extras_t = {"adapt": {"step_size": jnp.float32(0.0)}}
    state2, key2, step, extras2 = load_checkpoint(path, template, extras_t)
    assert step == 42
    assert np.allclose(state2["pos"], state["pos"])
    assert float(extras2["adapt"]["step_size"]) == np.float32(0.1)
    # restored key produces the same stream
    a = jax.random.normal(key, (3,))
    b = jax.random.normal(key2, (3,))
    assert np.allclose(a, b)


def test_checkpoint_shape_mismatch_raises(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, {"x": jnp.zeros(3)}, key=jax.random.key(0), step=1)
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, {"x": jnp.zeros(4)})


def test_datasets_shapes():
    (Xtr, ytr), (Xte, yte) = datasets.blobs(n=100)
    assert Xtr.shape[0] + Xte.shape[0] == 100
    X, y = datasets.mnist()
    assert X.shape == (60000, 784) and y.shape == (60000,)
    assert float(X.min()) >= 0.0 and float(X.max()) <= 1.0
    assert int(y.max()) == 9
    Xd, yd = datasets.digits()
    assert Xd.shape == (1797, 64)
    Xp, yp = datasets.plantvillage_features(n=100)
    assert Xp.shape == (100, 512) and int(yp.max()) < 38


def test_mnist_hdf5_reference_format(tmp_path):
    """The reference's mnist_train.h5 layout (X_train/y_train keys,
    benchmarks/2.-MNIST.ipynb cell 2) loads correctly."""
    import h5py

    path = str(tmp_path / "mnist_train.h5")
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        f["X_train"] = rng.randint(0, 255, (32, 784)).astype(np.float32)
        f["y_train"] = np.eye(10, dtype=np.float32)[rng.randint(0, 10, 32)]
    X, y = datasets.mnist(path)
    assert X.shape == (32, 784)
    assert float(X.max()) <= 1.0  # rescaled from [0,255]
    assert y.shape == (32,)       # de-one-hotted


def test_streaming_checkpoint_resume_exact(tmp_path):
    """Interrupt + resume reproduces the uninterrupted run's draws EXACTLY
    (VERDICT r2 item 7): chunk keys are fold_in(sample_key, chunk_index) and
    the checkpoint carries (states, step sizes, inv mass, key, draws-done)."""
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc
    from dropout_hamiltonian_montecarlo_tpu.inference.sampling import (
        init_chain_positions,
        sample_posterior_streaming,
    )
    from dropout_hamiltonian_montecarlo_tpu.models import MVNGaussian

    dim, chains = 3, 2
    model = MVNGaussian(jnp.zeros(dim), jnp.eye(dim) + 0.3)
    logdensity = model.make_logdensity()
    kernel = hmc.build_kernel(logdensity, num_integration_steps=4)
    init_fn = lambda p: hmc.init(p, logdensity)
    key = jax.random.key(0)
    positions = init_chain_positions(model.init_params, key, chains)

    def run(path, ckpt, num_samples, resume=False):
        mode = "a" if resume else "w"
        with HDF5Backend(path, mode=mode) as b:
            sample_posterior_streaming(
                init_fn, kernel, positions, key, b,
                num_samples=num_samples, chunk_size=10, num_warmup=30,
                num_chains=chains, checkpoint_path=ckpt, resume=resume)
            return b.read()

    # uninterrupted 40 draws
    full = run(str(tmp_path / "full.h5"), str(tmp_path / "full.ckpt"), 40)
    # interrupted at 20, then resumed to 40
    p2, c2 = str(tmp_path / "part.h5"), str(tmp_path / "part.ckpt")
    run(p2, c2, 20)
    part = run(p2, c2, 40, resume=True)
    assert part["x"].shape == full["x"].shape == (40, chains, dim)
    np.testing.assert_array_equal(part["x"], full["x"])


def test_streaming_resume_after_crash_between_append_and_checkpoint(tmp_path):
    """A crash BETWEEN the chunk append and the checkpoint write leaves the
    backend one chunk ahead of the checkpoint counter; resume must truncate
    the backend back to the counter so the final file equals the
    uninterrupted run's (VERDICT r3 weak #4)."""
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc
    from dropout_hamiltonian_montecarlo_tpu.inference.sampling import (
        init_chain_positions,
        sample_posterior_streaming,
    )
    from dropout_hamiltonian_montecarlo_tpu.models import MVNGaussian

    dim, chains = 3, 2
    model = MVNGaussian(jnp.zeros(dim), jnp.eye(dim) + 0.3)
    logdensity = model.make_logdensity()
    kernel = hmc.build_kernel(logdensity, num_integration_steps=4)
    init_fn = lambda p: hmc.init(p, logdensity)
    key = jax.random.key(0)
    positions = init_chain_positions(model.init_params, key, chains)

    def run(path, ckpt, num_samples, resume=False):
        mode = "a" if resume else "w"
        with HDF5Backend(path, mode=mode) as b:
            sample_posterior_streaming(
                init_fn, kernel, positions, key, b,
                num_samples=num_samples, chunk_size=10, num_warmup=30,
                num_chains=chains, checkpoint_path=ckpt, resume=resume)
            return b.read()

    full = run(str(tmp_path / "full.h5"), str(tmp_path / "full.ckpt"), 40)

    p2, c2 = str(tmp_path / "part.h5"), str(tmp_path / "part.ckpt")
    run(p2, c2, 20)  # checkpoint says 20 draws
    # simulate the crash: one more chunk reaches the backend but the
    # checkpoint never updates (garbage draws stand in for the lost chunk)
    with HDF5Backend(p2, mode="a") as b:
        assert b.num_draws() == 20
        b.append({"x": np.full((10, chains, dim), 1e9, np.float32)})
        assert b.num_draws() == 30
    part = run(p2, c2, 40, resume=True)
    assert part["x"].shape == full["x"].shape == (40, chains, dim)
    np.testing.assert_array_equal(part["x"], full["x"])


def test_streaming_collection_cli(tmp_path):
    """mvn-hmc --save --stream-chunk: draws are spooled to HDF5 in chunks
    during sampling; datasets come back (draws, chains, dim) and the summary
    line still prints (reference parity: per-draw HDF5 spooling in
    /root/reference/hamiltonian/inference/cpu/sgld_multicore.py:38-57)."""
    import json
    import contextlib
    import io as _io

    import h5py
    from dropout_hamiltonian_montecarlo_tpu.cli import main

    f = str(tmp_path / "stream.h5")
    out = _io.StringIO()
    with contextlib.redirect_stdout(out):
        main(["mvn-hmc", "--chains", "2", "--samples", "40", "--warmup", "50",
              "--save", f, "--stream-chunk", "16"])
    agg = json.loads(out.getvalue().strip().splitlines()[-1])
    assert agg["workload"] == "mvn-hmc"
    with h5py.File(f, "r") as h:
        x = h["x"][:]
    assert x.shape == (40, 2, 2)  # (draws, chains, dim), appended in chunks


def test_batched_streaming_resume_exact_and_guards(tmp_path):
    """sample_batched_streaming resume semantics: interrupted+resumed run
    equals the uninterrupted one (step sizes restored from the checkpoint,
    placeholders ignored); resuming mid-run with a different chunk size
    raises; resuming a completed run is a no-op (no zero-take chunk
    advancing the checkpointed states)."""
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc
    from dropout_hamiltonian_montecarlo_tpu.inference.sampling import (
        sample_batched_streaming,
    )
    from dropout_hamiltonian_montecarlo_tpu.models import MVNGaussian

    dim, chains = 3, 4
    model = MVNGaussian(jnp.zeros(dim), jnp.eye(dim) + 0.3)
    logdensity = model.make_logdensity()
    vag = jax.vmap(jax.value_and_grad(logdensity))
    kernel = hmc.build_batched_kernel(vag, 4)
    positions = {"x": jax.random.normal(jax.random.key(0), (chains, dim))}
    states = hmc.batched_init(positions, vag)
    step_sizes = jnp.full((chains,), 0.4, jnp.float32)
    inv_mass = jax.tree_util.tree_map(jnp.ones_like, positions)
    key = jax.random.key(1)

    def run(path, ckpt, num, ss, resume=False):
        mode = "a" if resume else "w"
        with HDF5Backend(path, mode=mode) as b:
            _, appended, _ = sample_batched_streaming(
                kernel, states, ss, inv_mass, key, b, num_samples=num,
                chunk_size=10, checkpoint_path=ckpt, resume=resume)
            return b.read(), appended

    full, _ = run(str(tmp_path / "f.h5"), str(tmp_path / "f.ckpt"), 40,
                  step_sizes)

    p, c = str(tmp_path / "p.h5"), str(tmp_path / "p.ckpt")
    run(p, c, 20, step_sizes)
    # resume with PLACEHOLDER step sizes: the checkpointed ones must win
    part, appended = run(p, c, 40, jnp.full((chains,), 99.0), resume=True)
    assert appended == 40
    np.testing.assert_array_equal(part["x"], full["x"])

    # different chunk size mid-run -> hard error, not silent corruption
    run(p, c, 20, step_sizes)  # reset to 20 draws... (fresh file, ckpt=20)
    with HDF5Backend(p, mode="a") as b:
        with pytest.raises(ValueError, match="chunk_size"):
            sample_batched_streaming(
                kernel, states, step_sizes, inv_mass, key, b,
                num_samples=40, chunk_size=15, checkpoint_path=c,
                resume=True)

    # resuming a COMPLETED run appends nothing and leaves the file intact
    done, appended = run(str(tmp_path / "f.h5"), str(tmp_path / "f.ckpt"),
                         40, jnp.full((chains,), 99.0), resume=True)
    assert appended == 40
    np.testing.assert_array_equal(done["x"], full["x"])


def test_sharded_backend_single_process_roundtrip(tmp_path):
    """ShardedHDF5Backend degenerates to one file single-process; shard
    assembly restores global chain order from the stored indices."""
    import numpy as np
    from dropout_hamiltonian_montecarlo_tpu.io import (
        ShardedHDF5Backend,
        assemble_shards,
        posterior_mean,
        shard_paths,
    )

    rng = np.random.default_rng(0)
    block = {"w": rng.normal(size=(5, 4, 3)).astype(np.float32)}
    base = str(tmp_path / "draws.h5")
    with ShardedHDF5Backend(base, mode="w") as b:
        b.append(block)
        b.append(block)
        path0 = b.path
    assert path0 == shard_paths(base, 1)[0]
    out = assemble_shards([path0])
    np.testing.assert_array_equal(
        out["w"], np.concatenate([block["w"], block["w"]]))
    # posterior_mean skips the chain-index bookkeeping dataset
    pm = posterior_mean([path0])
    np.testing.assert_allclose(pm["w"], block["w"].mean(axis=0), rtol=1e-6)


def test_assemble_shards_reorders_chains(tmp_path):
    """Files written by different processes hold disjoint chain ranges;
    assembly places them back at their GLOBAL indices regardless of file
    order."""
    import h5py
    import numpy as np
    from dropout_hamiltonian_montecarlo_tpu.io import assemble_shards

    full = np.arange(3 * 6 * 2, dtype=np.float32).reshape(3, 6, 2)
    paths = []
    # write the two shards out of order (chains 3..5 first)
    for i, sl in enumerate([slice(3, 6), slice(0, 3)]):
        p = str(tmp_path / f"draws_{i}.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("w", data=full[:, sl])
            f.create_dataset("__chain_indices__",
                             data=np.arange(sl.start, sl.stop))
        paths.append(p)
    out = assemble_shards(paths)
    np.testing.assert_array_equal(out["w"], full)


def test_batched_streaming_resume_legacy_checkpoint_without_inv_mass(
        tmp_path):
    """Checkpoints written before inv_mass was persisted (extras carry only
    step_size) must still resume — the caller's inv_mass is used instead of
    a KeyError (r5 review finding)."""
    import numpy as np
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc
    from dropout_hamiltonian_montecarlo_tpu.inference.sampling import (
        sample_batched_streaming,
    )
    from dropout_hamiltonian_montecarlo_tpu.io import HDF5Backend
    from dropout_hamiltonian_montecarlo_tpu.io.checkpoint import (
        save_checkpoint,
    )
    from dropout_hamiltonian_montecarlo_tpu.models import MVNGaussian

    dim, chains = 3, 4
    model = MVNGaussian(jnp.zeros(dim), jnp.eye(dim) + 0.3)
    vag = jax.vmap(jax.value_and_grad(model.make_logdensity()))
    kernel = hmc.build_batched_kernel(vag, 4)
    positions = {"x": jax.random.normal(jax.random.key(0), (chains, dim))}
    states = hmc.batched_init(positions, vag)
    step_sizes = jnp.full((chains,), 0.4, jnp.float32)
    inv_mass = jax.tree_util.tree_map(jnp.ones_like, positions)
    key = jax.random.key(1)

    path, ckpt = str(tmp_path / "d.h5"), str(tmp_path / "d.ckpt")
    with HDF5Backend(path, mode="w") as b:
        sample_batched_streaming(kernel, states, step_sizes, inv_mass, key,
                                 b, num_samples=10, chunk_size=10)
        first = b.read()
    # legacy-format checkpoint: extras WITHOUT inv_mass
    save_checkpoint(ckpt, states, key=key, step=10,
                    extras={"step_size": step_sizes})
    with HDF5Backend(path, mode="a") as b:
        _, appended, _ = sample_batched_streaming(
            kernel, states, step_sizes, inv_mass, key, b, num_samples=20,
            chunk_size=10, checkpoint_path=ckpt, resume=True)
        out = b.read()
    assert appended == 20
    np.testing.assert_array_equal(out["x"][:10], first["x"])
    assert out["x"].shape[0] == 20
