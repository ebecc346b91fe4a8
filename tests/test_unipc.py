"""Tests for the scan-compatible UniPC solver.

Oracle: an independent stateful numpy implementation of order-2 UniPC-bh2
(predict_x0, flow prediction) written directly from the algorithm equations,
run step-by-step with python lists — then compared against our traced
pytree-state implementation, both eagerly and under lax.fori_loop/jit.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.schedulers import unipc


def _np_schedule(n, shift, N=1000):
    sigma_max = (N - 1) / N
    sig = np.linspace(sigma_max, 0.0, n + 1)[:-1]
    sig = shift * sig / (1 + (shift - 1) * sig)
    ts = sig * N
    sig = np.concatenate([sig, [0.0]]).astype(np.float64)
    return sig, ts


class _NpUniPC:
    """Stateful numpy UniPC order-2 bh2 oracle (predict_x0, flow pred)."""

    def __init__(self, sigmas):
        self.sigmas = sigmas
        self.i = 0
        self.m = []  # converted outputs history
        self.last_sample = None
        self.this_order = None
        self.lower = 0

    @staticmethod
    def _lam(s):
        s = max(s, 1e-20)
        return np.log1p(-s) - np.log(s)

    def _coeffs(self, h):
        hh = -h
        hp1 = np.expm1(hh)
        Bh = hp1
        hpk = hp1 / hh - 1.0
        b1 = hpk / Bh
        hpk = hpk / hh - 0.5
        b2 = hpk * 2.0 / Bh
        return hp1, Bh, b1, b2

    def step(self, v, x):
        i, sig = self.i, self.sigmas
        m_t = x - sig[i] * v
        # corrector
        if i > 0 and self.last_sample is not None:
            st, ss0 = sig[i], sig[i - 1]
            at = 1 - st
            h = self._lam(st) - self._lam(ss0)
            hp1, Bh, b1, b2 = self._coeffs(h)
            base = st / ss0 * self.last_sample - at * hp1 * self.m[-1]
            if self.this_order >= 2:
                ss1 = sig[i - 2]
                rk = (self._lam(ss1) - self._lam(ss0)) / h
                D1s = (self.m[-2] - self.m[-1]) / rk
                c0 = (b1 - b2) / (1 - rk)
                c1 = b1 - c0
                x = base - at * Bh * (c0 * D1s + c1 * (m_t - self.m[-1]))
            else:
                x = base - at * Bh * (0.5 * (m_t - self.m[-1]))
        # history
        self.m.append(m_t)
        self.m = self.m[-2:]
        n = len(self.sigmas) - 1
        this_order = min(2, n - i, self.lower + 1)
        # predictor
        st, ss0 = sig[i + 1], sig[i]
        at = 1 - st
        h = self._lam(st) - self._lam(ss0)
        hp1, Bh, b1, b2 = self._coeffs(h)
        base = st / max(ss0, 1e-20) * x - at * hp1 * self.m[-1]
        if this_order >= 2:
            ss1 = sig[i - 1]
            rk = (self._lam(ss1) - self._lam(ss0)) / h
            D1s = (self.m[-2] - self.m[-1]) / rk
            out = base - at * Bh * 0.5 * D1s
        else:
            out = base
        self.last_sample = x
        self.this_order = this_order
        self.lower = min(self.lower + 1, 2)
        self.i += 1
        return out


def test_schedule_grid():
    sched = unipc.unipc_schedule(40, shift=5.0)
    sig_np, ts_np = _np_schedule(40, 5.0)
    np.testing.assert_allclose(np.asarray(sched.sigmas), sig_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.timesteps), ts_np, atol=2e-2)
    assert sched.num_steps == 40


def test_unipc_matches_numpy_oracle_full_chain():
    n = 12
    shift = 3.0
    sched = unipc.unipc_schedule(n, shift=shift)
    sig_np, ts_np = _np_schedule(n, shift)
    rng = np.random.RandomState(0)
    shape = (1, 4, 6)
    x0_np = rng.randn(*shape)

    # deterministic fake velocity field, same for both
    def vel_np(x, t):
        return 0.3 * x - 0.01 * t / 1000.0

    oracle = _NpUniPC(sig_np)
    x_np = x0_np.copy()
    xs_np = []
    for i in range(n):
        x_np = oracle.step(vel_np(x_np, ts_np[i]), x_np)
        xs_np.append(x_np.copy())

    state = unipc.init_state(shape)
    x = jnp.asarray(x0_np, jnp.float32)
    for i in range(n):
        v = 0.3 * x - 0.01 * sched.timesteps[i] / 1000.0
        x, state = unipc.unipc_step(sched, state, v, x)
        np.testing.assert_allclose(
            np.asarray(x), xs_np[i], rtol=2e-4, atol=2e-4,
            err_msg=f"diverged at step {i}",
        )


def test_rollout_fori_loop_equals_eager():
    n = 10
    sched = unipc.unipc_schedule(n, shift=5.0)
    shape = (1, 4, 4)
    x0 = jnp.asarray(np.random.RandomState(1).randn(*shape), jnp.float32)

    def vel(x, t):
        return 0.5 * jnp.tanh(x) + t / 5000.0

    x_roll, _ = jax.jit(
        lambda x: unipc.rollout(sched, vel, x)
    )(x0)

    x = x0.astype(jnp.float32)
    st = unipc.init_state(shape)
    for i in range(n):
        x, st = unipc.unipc_step(sched, st, vel(x, sched.timesteps[i]), x)
    np.testing.assert_allclose(np.asarray(x_roll), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_rollout_stop_index_truncates():
    """PRFL-style truncated rollout: steps >= stop_index are identity."""
    n = 10
    sched = unipc.unipc_schedule(n, shift=5.0)
    shape = (1, 4, 4)
    x0 = jnp.asarray(np.random.RandomState(2).randn(*shape), jnp.float32)

    def vel(x, t):
        return -0.2 * x

    stop = jnp.int32(4)
    x_trunc, st_trunc = jax.jit(
        lambda x, s: unipc.rollout(sched, vel, x, stop_index=s)
    )(x0, stop)

    x = x0.astype(jnp.float32)
    st = unipc.init_state(shape)
    for i in range(4):
        x, st = unipc.unipc_step(sched, st, vel(x, sched.timesteps[i]), x)
    np.testing.assert_allclose(np.asarray(x_trunc), np.asarray(x), rtol=1e-5, atol=1e-5)
    assert int(st_trunc.step_index) == 4


def test_final_step_is_finite():
    """sigma -> 0 endpoint must not produce NaN/Inf (log(0) guards)."""
    n = 4
    sched = unipc.unipc_schedule(n, shift=5.0)
    x = jnp.ones((2, 2), jnp.float32)
    st = unipc.init_state(x.shape)
    for i in range(n):
        x, st = unipc.unipc_step(sched, st, jnp.full_like(x, 0.3), x)
        assert np.isfinite(np.asarray(x)).all(), f"non-finite at step {i}"


def test_rollout_extra_carry_matches_plain():
    """The extra-carry hook (TeaCache's path into the shared scan) must be
    bit-identical to the plain path and thread its carry, including under
    stop_index truncation."""
    n = 10
    sched = unipc.unipc_schedule(n, shift=5.0)
    shape = (1, 4, 4)
    x0 = jnp.asarray(np.random.RandomState(3).randn(*shape), jnp.float32)

    def vel(x, t):
        return 0.3 * jnp.tanh(x) + t / 4000.0

    def vel_c(x, t, i, c):
        return vel(x, t), c + 1

    x_plain, _ = jax.jit(lambda x: unipc.rollout(sched, vel, x))(x0)
    x_c, _, calls = jax.jit(
        lambda x: unipc.rollout(sched, vel_c, x, extra_init=jnp.int32(0))
    )(x0)
    np.testing.assert_array_equal(np.asarray(x_plain), np.asarray(x_c))
    assert int(calls) == n

    stop = jnp.int32(4)
    x_t, st_t = jax.jit(
        lambda x, s: unipc.rollout(sched, vel, x, stop_index=s))(x0, stop)
    x_tc, st_tc, calls_t = jax.jit(
        lambda x, s: unipc.rollout(sched, vel_c, x, stop_index=s,
                                   extra_init=jnp.int32(0)))(x0, stop)
    np.testing.assert_array_equal(np.asarray(x_t), np.asarray(x_tc))
    assert int(calls_t) == 4
    assert int(st_tc.step_index) == int(st_t.step_index) == 4
