"""Warmup schedule + adaptation unit tests (host-side logic; cheap)."""

import numpy as np
import jax.numpy as jnp

import jax

from dropout_hamiltonian_montecarlo_tpu.inference.warmup import (
    build_schedule,
    run_warmup,
)
from dropout_hamiltonian_montecarlo_tpu.ops.adaptation import (
    WelfordState,
    welford_init,
    welford_inv_mass,
    welford_update,
)


def test_schedule_standard_1000():
    is_middle, window_end = build_schedule(1000)
    assert is_middle.shape == (1000,)
    # fast buffers: first 75 and last 50 are not middle
    assert not is_middle[:75].any()
    assert not is_middle[950:].any()
    assert is_middle[75:950].all()
    # window ends only inside the middle, last one at the middle boundary
    ends = np.where(window_end)[0]
    assert len(ends) >= 2
    assert ends[-1] == 949
    # doubling windows: first window is 25 wide
    assert ends[0] == 75 + 25 - 1


def test_schedule_short_warmup():
    is_middle, window_end = build_schedule(150)
    assert is_middle.shape == (150,)
    assert window_end.sum() >= 1
    # buffers shrink proportionally, schedule remains valid
    ends = np.where(window_end)[0]
    assert all(0 <= e < 150 for e in ends)


def test_schedule_tiny_no_middle():
    is_middle, window_end = build_schedule(10)
    assert not is_middle.any() and not window_end.any()


def test_welford_matches_numpy_variance():
    rng = np.random.RandomState(0)
    xs = rng.randn(500, 3).astype(np.float32) * np.array([1.0, 2.0, 0.5],
                                                         np.float32)
    state = welford_init({"x": jnp.zeros(3)})
    for row in xs:
        state = welford_update(state, {"x": jnp.asarray(row)})
    inv_mass = welford_inv_mass(state, regularize=False)
    assert np.allclose(np.asarray(inv_mass["x"]), xs.var(0, ddof=1),
                       rtol=1e-3)


def test_welford_regularization_shrinks_to_unit():
    state = welford_init({"x": jnp.zeros(2)})
    # only 3 samples -> heavy shrinkage toward 1e-3 floor mixture
    for v in [0.0, 0.1, -0.1]:
        state = welford_update(state, {"x": jnp.full((2,), v)})
    reg = welford_inv_mass(state, regularize=True)
    raw = welford_inv_mass(state, regularize=False)
    assert np.all(np.asarray(reg["x"]) != np.asarray(raw["x"]))


def test_batched_warmup_adapts_per_chain_step_sizes():
    """run_warmup over a chain-BATCHED kernel (one compiled scan, per-chain
    dual averaging): chains targeting different-scale posteriors must adapt
    DIFFERENT step sizes, and acceptance must land near the target."""
    from dropout_hamiltonian_montecarlo_tpu.inference import hmc
    from dropout_hamiltonian_montecarlo_tpu.ops.tree import tree_ones_like

    C, dim = 4, 6
    # per-chain Gaussian scales: chain c targets N(0, s_c^2 I)
    scales = jnp.array([0.05, 0.3, 1.0, 4.0])

    def batched_vag(pos):
        x = pos["x"]                                   # (C, dim)
        val = -0.5 * jnp.sum((x / scales[:, None]) ** 2, axis=-1)
        grad = {"x": -x / scales[:, None] ** 2}
        return val, grad

    positions = {"x": 0.1 * jnp.ones((C, dim), jnp.float32)}
    state = hmc.batched_init(positions, batched_vag)
    kernel = hmc.build_batched_kernel(batched_vag, num_integration_steps=8)

    res = run_warmup(kernel, state, jax.random.key(0), 400,
                     initial_step_size=jnp.full((C,), 0.1, jnp.float32),
                     target_acceptance=0.8, adapt_mass=False)
    ss = np.asarray(res.step_size)
    assert ss.shape == (C,)
    # adapted step size tracks the target scale (monotone in s_c)
    assert np.all(np.diff(ss) > 0), ss
    infos, _ = res.info
    acc_tail = np.asarray(infos.acceptance_prob)[-100:].mean(axis=0)
    assert np.all(np.abs(acc_tail - 0.8) < 0.15), acc_tail
