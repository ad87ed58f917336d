"""ChEES trajectory-length adaptation (inference/chees.py).

The reference never adapts its `path_length` (cpu/hmc.py:12,46 — a fixed
constructor argument); ChEES is a new capability, so the tests check it
against the mathematics of the Gaussian target rather than reference outputs:

- on N(0, I_d) the Hamiltonian flow is a rotation and the ChEES criterion
  E[(||q'||^2 - ||q||^2)^2] ~ sin^2(theta) is maximized by a quarter-to-half
  period, so the adapted T must land in a band around pi/2..pi;
- the criterion is scale-equivariant: scaling the target by s must scale the
  adapted T by ~s (the property that makes trajectory adaptation worth having
  at all — wrong-scale T is exactly what fixed path_length gets wrong).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropout_hamiltonian_montecarlo_tpu.inference import chees, hmc
from dropout_hamiltonian_montecarlo_tpu.inference.chees import (
    halton_sequence,
    run_chees_warmup,
)


def _gaussian_problem(dim, num_chains, scale=1.0, seed=0):
    def logdensity(q):
        return -0.5 * jnp.sum((q["x"] / scale) ** 2)

    batched_vag = jax.vmap(jax.value_and_grad(logdensity))
    key = jax.random.key(seed)
    positions = {"x": scale * jax.random.normal(key, (num_chains, dim))}
    state = hmc.batched_init(positions, batched_vag)
    return batched_vag, state


def test_halton_low_discrepancy():
    h = halton_sequence(64)
    assert h.shape == (64,)
    assert np.all((h > 0) & (h < 1))
    # base-2 radical inverse: first values are 1/2, 1/4, 3/4, 1/8 ...
    np.testing.assert_allclose(h[:4], [0.5, 0.25, 0.75, 0.125])
    # stratification: every length-8 window covers both halves of (0,1)
    for i in range(0, 64, 8):
        w = h[i:i + 8]
        assert (w < 0.5).sum() == 4 and (w >= 0.5).sum() == 4


def test_chees_adapts_to_quarter_period_band():
    batched_vag, state = _gaussian_problem(dim=16, num_chains=64)
    res = jax.jit(
        lambda s, k: run_chees_warmup(
            batched_vag, s, k, num_steps=400, initial_step_size=0.2,
            initial_traj_length=0.5)
    )(state, jax.random.key(1))
    T = float(res.trajectory_length)
    eps = float(res.step_size)
    # rotation-flow optimum: T in a generous band around pi/2..pi — far from
    # both the 0.5 init and the max_leapfrog cap
    assert 1.0 < T < 6.0, T
    assert 0.05 < eps < 1.5, eps
    # joint adaptation holds acceptance near target
    accept_tail = np.asarray(res.info[0][-50:])
    assert 0.4 < accept_tail.mean() < 0.95
    assert int(res.num_integration_steps) >= 1


def test_chees_trajectory_scale_equivariance():
    def adapt(scale, seed):
        batched_vag, state = _gaussian_problem(
            dim=8, num_chains=64, scale=scale, seed=seed)
        res = jax.jit(
            lambda s, k: run_chees_warmup(
                batched_vag, s, k, num_steps=400,
                initial_step_size=0.2 * scale,
                initial_traj_length=0.5 * scale)
        )(state, jax.random.key(seed + 10))
        return float(res.trajectory_length)

    t1 = adapt(1.0, seed=0)
    t4 = adapt(4.0, seed=1)
    ratio = t4 / t1
    assert 2.0 < ratio < 8.0, (t1, t4)


def test_chees_composes_with_batched_sampling():
    # end-to-end: adapted (eps, L) feed the fixed-L batched kernel unchanged
    batched_vag, state = _gaussian_problem(dim=4, num_chains=32)
    res = jax.jit(
        lambda s, k: run_chees_warmup(
            batched_vag, s, k, num_steps=200, initial_step_size=0.3)
    )(state, jax.random.key(2))
    L = max(int(res.num_integration_steps), 1)
    kernel = hmc.build_batched_kernel(batched_vag, L)
    inv_mass = {"x": jnp.ones((32, 4))}
    ss = jnp.full((32,), float(res.step_size))

    def body(s, k):
        ns, info = kernel(k, s, ss, inv_mass)
        return ns, (ns.position["x"], info.acceptance_prob)

    keys = jax.random.split(jax.random.key(3), 300)
    _, (draws, accs) = jax.lax.scan(body, res.state, keys)
    assert float(accs.mean()) > 0.5
    # moment sanity on the pooled cloud: N(0,1) coordinates
    flat = np.asarray(draws).reshape(-1, 4)
    assert np.abs(flat.mean(0)).max() < 0.25
    assert np.abs(flat.std(0) - 1.0).max() < 0.25
