"""Warmup schedule + adaptation unit tests (host-side logic; cheap)."""

import numpy as np
import jax.numpy as jnp

from dropout_hamiltonian_montecarlo_tpu.inference.warmup import build_schedule
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
