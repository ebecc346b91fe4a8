"""Golden tests for the flow-matching discrete scheduler.

Oracles are independent numpy implementations of the documented equations
(reference scheduling_flow_match_discrete.py), not imports of the reference.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyvideo_prfl_tpu.schedulers import flow_match as fm


def test_train_schedule_grid():
    sched = fm.train_schedule(num_train_timesteps=1000)
    sig = np.linspace(1.0, 0.0, 1001, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(sched.sigmas), sig, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.timesteps), sig[:-1] * 1000, atol=1e-3
    )


@pytest.mark.parametrize("shift", [1.0, 3.0, 5.0])
def test_inference_schedule_shift_warp(shift):
    n = 40
    sched = fm.inference_schedule(n, shift=shift)
    sig = np.linspace(1.0, 0.0, n + 1)
    sig = (shift * sig) / (1 + (shift - 1) * sig)
    np.testing.assert_allclose(np.asarray(sched.sigmas), sig, atol=1e-6)
    assert sched.num_steps == n
    # endpoints invariant under the warp
    assert sched.sigmas[0] == pytest.approx(1.0)
    assert sched.sigmas[-1] == pytest.approx(0.0)


def test_euler_step_matches_formula():
    sched = fm.inference_schedule(10, shift=3.0)
    x = jnp.ones((2, 4)) * 0.5
    v = jnp.full((2, 4), -0.25)
    out = fm.euler_step(sched, v, x, jnp.int32(3))
    dt = float(sched.sigmas[4] - sched.sigmas[3])
    np.testing.assert_allclose(np.asarray(out), 0.5 - 0.25 * dt, rtol=1e-6)


def test_add_noise_and_target_and_x0_roundtrip():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 3, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4))
    sigma = jnp.float32(0.37)
    xt = fm.add_noise(x0, eps, sigma)
    np.testing.assert_allclose(
        np.asarray(xt), np.asarray((1 - 0.37) * x0 + 0.37 * eps), rtol=1e-6
    )
    v = fm.train_target(x0, eps)
    np.testing.assert_allclose(np.asarray(v), np.asarray(eps - x0), rtol=1e-6)
    # perfect velocity recovers x0 exactly: x_t - sigma * (eps - x0) = x0...
    # actually (1-s)x0 + s*eps - s*(eps - x0) = x0. exact.
    x0_rec = fm.get_x0(v, xt, sigma)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


def test_sample_train_timestep_bounds_and_determinism():
    sched = fm.train_schedule(1000)
    key = jax.random.PRNGKey(42)
    t, s = fm.sample_train_timestep(key, sched, 512, "logit_normal")
    assert t.shape == (512,) and s.shape == (512,)
    assert float(t.min()) >= 0.0 and float(t.max()) <= 1000.0
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
    t2, _ = fm.sample_train_timestep(key, sched, 512, "logit_normal")
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t2))
    tu, su = fm.sample_train_timestep(key, sched, 4096, "uniform")
    # uniform sampling should cover the range broadly
    assert float(tu.max()) > 900 and float(tu.min()) < 100


def test_sigma_for_timestep_lookup():
    sched = fm.train_schedule(1000)
    ts = sched.timesteps[jnp.array([0, 500, 999])]
    sig = fm.sigma_for_timestep(sched, ts)
    np.testing.assert_allclose(
        np.asarray(sig), np.asarray(sched.sigmas[jnp.array([0, 500, 999])]), atol=1e-6
    )


def test_euler_rollout_under_scan_jits():
    """Full Euler chain as lax.fori_loop — the XLA-native inference loop."""
    sched = fm.inference_schedule(8, shift=3.0)

    def vel(x, t):
        return -x * 0.1

    @jax.jit
    def run(x):
        def body(i, x):
            return fm.euler_step(sched, vel(x, sched.timesteps[i]), x, i)

        return jax.lax.fori_loop(0, sched.num_steps, body, x)

    out = run(jnp.ones((2, 4)))
    assert np.isfinite(np.asarray(out)).all()
