"""Flow-matching DPM-Solver++ (multistep, order 2), table-driven.

Parity target: reference `wan/utils/fm_solvers.py`
(FlowDPMSolverMultistepScheduler), specialized to its defaults:
algorithm dpmsolver++ (x0 prediction), solver_order=2, solver_type
midpoint, lower_order_final=True, final_sigmas_type="zero"
(fm_solvers.py:129-200). Selected by `--sample_solver dpm++`.

Same TPU-native formulation as unipc.py: all index-only quantities
(lambda gaps, exp(-h)-1 factors, order warmup) precompute host-side in
float64; the in-graph step is three multiply-adds:

    m_t = x - sigma_i * v
    x'  = A x + B m_t + C (m_t - m_prev)

with A = sigma_{i+1}/sigma_i, B = -alpha_{i+1} (e^{-h} - 1),
C = 0.5 B / r0 (order 2; 0 at warmup/final), r0 = h_prev / h
(fm_solvers.py:415-545).
"""

from __future__ import annotations

import math
from typing import Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np


@chex.dataclass(frozen=True)
class DPMSchedule:
    sigmas: jnp.ndarray  # [n+1]
    timesteps: jnp.ndarray  # [n]
    sigma_tab: jnp.ndarray  # [n] sigma_i for x0 conversion
    a_tab: jnp.ndarray  # [n]
    b_tab: jnp.ndarray  # [n]
    c_tab: jnp.ndarray  # [n]
    num_train_timesteps: int = 1000

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


@chex.dataclass
class DPMState:
    m_prev: jnp.ndarray
    step_index: jnp.ndarray  # int32


def _lam(s: float) -> float:
    s = max(s, 1e-20)
    return math.log1p(-s) - math.log(s)


def dpm_schedule(num_inference_steps: int, shift: float = 5.0,
                 num_train_timesteps: int = 1000) -> DPMSchedule:
    n_train = num_train_timesteps
    sigma_max = (n_train - 1) / n_train
    sig = np.linspace(sigma_max, 0.0, num_inference_steps + 1,
                      dtype=np.float64)[:-1]
    sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    timesteps = sig * n_train
    sig = np.concatenate([sig, [0.0]])

    n = num_inference_steps
    a = np.zeros(n)
    b = np.zeros(n)
    c = np.zeros(n)
    for i in range(n):
        order = min(2, n - i, i + 1)
        st, s0 = sig[i + 1], sig[i]
        at = 1.0 - st
        if st <= 0.0:
            a[i], b[i], c[i] = 0.0, at, 0.0
            continue
        h = _lam(st) - _lam(s0)
        a[i] = st / max(s0, 1e-20)
        b[i] = -at * (math.exp(-h) - 1.0)
        if order >= 2:
            s1 = sig[i - 1]
            h0 = _lam(s0) - _lam(s1)
            r0 = h0 / h
            c[i] = 0.5 * b[i] / r0
    return DPMSchedule(
        sigmas=jnp.asarray(sig, jnp.float32),
        timesteps=jnp.asarray(timesteps, jnp.float32),
        sigma_tab=jnp.asarray(sig[:n], jnp.float32),
        a_tab=jnp.asarray(a, jnp.float32),
        b_tab=jnp.asarray(b, jnp.float32),
        c_tab=jnp.asarray(c, jnp.float32),
        num_train_timesteps=n_train,
    )


def init_state(sample_shape, dtype=jnp.float32) -> DPMState:
    return DPMState(
        m_prev=jnp.zeros(sample_shape, dtype),
        step_index=jnp.zeros((), jnp.int32),
    )


def dpm_step(schedule: DPMSchedule, state: DPMState,
             model_output: jnp.ndarray, sample: jnp.ndarray
             ) -> Tuple[jnp.ndarray, DPMState]:
    i = state.step_index
    x = sample.astype(jnp.float32)
    m_t = x - schedule.sigma_tab[i] * model_output.astype(jnp.float32)
    prev = (schedule.a_tab[i] * x + schedule.b_tab[i] * m_t
            + schedule.c_tab[i] * (m_t - state.m_prev))
    return prev, DPMState(m_prev=m_t, step_index=i + 1)


def rollout(schedule: DPMSchedule, velocity_fn, x_init: jnp.ndarray,
            stop_index=None):
    """Full (or truncated) chain as one lax.scan."""
    n = schedule.num_steps
    state0 = init_state(x_init.shape)

    def body(carry, xs):
        x, st = carry
        i, t, sig, a, b, c = xs

        def active(operand):
            x, st = operand
            v = velocity_fn(x, t).astype(jnp.float32)
            m_t = x - sig * v
            x_next = a * x + b * m_t + c * (m_t - st.m_prev)
            return (x_next, DPMState(m_prev=m_t,
                                     step_index=st.step_index + 1))

        if stop_index is None:
            x_next, st_next = active((x, st))
        else:
            # skip the model call entirely past stop_index (one cond branch)
            x_next, st_next = jax.lax.cond(
                i < stop_index, active, lambda op: op, (x, st))
        return (x_next, st_next), None

    xs = (jnp.arange(n, dtype=jnp.int32), schedule.timesteps,
          schedule.sigma_tab, schedule.a_tab, schedule.b_tab, schedule.c_tab)
    (x_final, state_final), _ = jax.lax.scan(
        body, (x_init.astype(jnp.float32), state0), xs)
    return x_final, state_final
