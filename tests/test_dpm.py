"""DPM-Solver++ tests vs an independent stateful numpy oracle."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.schedulers import dpm


def _np_lam(s):
    s = max(s, 1e-20)
    return math.log1p(-s) - math.log(s)


class _NpDPM:
    """Stateful numpy DPM++ order-2 midpoint oracle (flow prediction)."""

    def __init__(self, sigmas):
        self.sig = sigmas
        self.i = 0
        self.m = []

    def step(self, v, x):
        i, sig = self.i, self.sig
        n = len(sig) - 1
        m_t = x - sig[i] * v
        self.m.append(m_t)
        self.m = self.m[-2:]
        order = min(2, n - i, i + 1)
        st, s0 = sig[i + 1], sig[i]
        at = 1 - st
        if st <= 0:
            out = at * m_t
        else:
            h = _np_lam(st) - _np_lam(s0)
            a = st / s0
            b = -at * (math.exp(-h) - 1.0)
            if order >= 2:
                s1 = sig[i - 1]
                r0 = (_np_lam(s0) - _np_lam(s1)) / h
                D1 = (self.m[-1] - self.m[-2]) / r0
                out = a * x + b * m_t + 0.5 * b * D1
            else:
                out = a * x + b * m_t
        self.i += 1
        return out


def test_dpm_matches_numpy_oracle():
    n, shift = 10, 3.0
    sched = dpm.dpm_schedule(n, shift=shift)
    sig = np.asarray(sched.sigmas, np.float64)
    rng = np.random.RandomState(0)
    shape = (1, 4, 4)
    x_np = rng.randn(*shape)

    def vel(x, t):
        return 0.2 * x + 0.001 * t

    oracle = _NpDPM(sig)
    x = jnp.asarray(x_np, jnp.float32)
    st = dpm.init_state(shape)
    for i in range(n):
        t = float(sched.timesteps[i])
        v_j = vel(x, t)
        x, st = dpm.dpm_step(sched, st, v_j, x)
        x_np = oracle.step(vel(x_np, t), x_np)
        np.testing.assert_allclose(
            np.asarray(x), x_np, rtol=3e-4, atol=3e-4,
            err_msg=f"step {i}",
        )


def test_dpm_rollout_matches_eager():
    n = 8
    sched = dpm.dpm_schedule(n, shift=5.0)
    x0 = jnp.asarray(np.random.RandomState(1).randn(2, 4), jnp.float32)

    def vel(x, t):
        return -0.3 * jnp.tanh(x)

    x_roll, _ = jax.jit(lambda x: dpm.rollout(sched, vel, x))(x0)
    x = x0
    st = dpm.init_state(x0.shape)
    for i in range(n):
        x, st = dpm.dpm_step(sched, st, vel(x, sched.timesteps[i]), x)
    np.testing.assert_allclose(np.asarray(x_roll), np.asarray(x),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(x_roll)).all()
