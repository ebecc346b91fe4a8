"""Flow-matching UniPC multistep solver, TPU-native formulation.

Behavioral parity target: reference `diffusers_lite/wan/utils/fm_solvers_unipc.py`
(FlowUniPCMultistepScheduler), specialized to the configuration the reference
uses everywhere (train_prfl.py:413-415, wan/image2video.py:312-318):

    solver_order=2, predict_x0=True, prediction_type="flow_prediction",
    solver_type="bh2", lower_order_final=True, final_sigmas_type="zero",
    thresholding=False, corrector enabled.

TPU-first design: every quantity that depends only on the step index —
sigmas, log-SNR gaps, bh2 coefficients, the 2x2 corrector solve, the
order-warmup schedule (min(2, n-i, i+1)) — is precomputed ONCE in float64
numpy when the schedule is built. The in-graph step is then six multiply-adds
over the video tensor with per-step scalar coefficients, and a rollout is a
single `lax.scan` over the coefficient table (no gathers, no transcendentals,
no divisions inside the loop). The reference instead recomputes log/expm1 and
solves the linear system per step in python (fm_solvers_unipc.py:350-626).

Step math (predict_x0 / flow-prediction / bh2), with m = x0-prediction:

    m_t       = x - sigma_i * v
    corrected = A_c x_last + B_c m0 + C_c (m1 - m0) + D_c (m_t - m0)   [i > 0]
    x_next    = A_p x + B_p m_t + C_p (m0 - m_t)

where (with alpha = 1 - sigma, lambda = log(alpha/sigma), h = lambda_t -
lambda_s0, hh = -h, phi1 = expm1(hh), B_h = phi1):

    A_p = sigma_t/sigma_s0,  B_p = -alpha_t*phi1,
    C_p = -alpha_t*B_h*0.5/r (order 2, r = (lambda_s1-lambda_s0)/h) else 0,
    and the corrector coefficients from the 2x2 system R rho = b
    (R = [[1,1],[r,1]], b = [phi1/hh-1, 2((phi1/hh-1)/hh-1/2)]/B_h).
"""

from __future__ import annotations

import math
from typing import Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np


@chex.dataclass(frozen=True)
class UniPCCoeffs:
    """Per-step scalar coefficient table, each of shape [num_steps]."""

    sigma: jnp.ndarray  # sigma_i for the x0 conversion
    # corrector (applied to the incoming sample before the predictor):
    gate_c: jnp.ndarray  # 1.0 when the corrector is active (i > 0)
    a_c: jnp.ndarray  # coef of last_sample
    b_c: jnp.ndarray  # coef of m0
    c_c: jnp.ndarray  # coef of (m1 - m0)
    d_c: jnp.ndarray  # coef of (m_t - m0)
    # predictor:
    a_p: jnp.ndarray  # coef of sample
    b_p: jnp.ndarray  # coef of m_t
    c_p: jnp.ndarray  # coef of (m0_prev - m_t)


@chex.dataclass(frozen=True)
class UniPCSchedule:
    """Sigma/timestep grid + precomputed step coefficients."""

    sigmas: jnp.ndarray  # [num_steps + 1] fp32, last entry 0
    timesteps: jnp.ndarray  # [num_steps] fp32
    coeffs: UniPCCoeffs
    num_train_timesteps: int = 1000

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


@chex.dataclass
class UniPCState:
    """Traced multistep solver state (the scan carry)."""

    m0: jnp.ndarray  # last x0-prediction
    m1: jnp.ndarray  # before-last x0-prediction
    last_sample: jnp.ndarray  # sample before the last predictor
    step_index: jnp.ndarray  # int32 scalar


def _lam(s: float) -> float:
    s = max(s, 1e-20)
    return math.log1p(-s) - math.log(s)


def _phi_b(h: float) -> Tuple[float, float, float]:
    """(phi1, b1, b2) for bh2 at hh = -h; B_h = phi1."""
    hh = -h
    phi1 = math.expm1(hh)
    b_h = phi1
    k1 = phi1 / hh - 1.0
    b1 = k1 / b_h
    k2 = k1 / hh - 0.5
    b2 = k2 * 2.0 / b_h
    return phi1, b1, b2


def _build_coeffs(sigmas: np.ndarray) -> UniPCCoeffs:
    """float64 host-side precompute of all per-step coefficients."""
    n = len(sigmas) - 1
    sig = sigmas.astype(np.float64)
    z = np.zeros(n)
    out = dict(
        sigma=sig[:n].copy(), gate_c=z.copy(), a_c=z.copy(), b_c=z.copy(),
        c_c=z.copy(), d_c=z.copy(), a_p=z.copy(), b_p=z.copy(), c_p=z.copy(),
    )
    for i in range(n):
        # order schedule: predictor at step i uses
        #   this_order_i = min(2, n - i, lower_order_nums_i + 1), lower = i
        op = min(2, n - i, i + 1)
        # corrector at step i uses the order chosen by predictor i-1
        oc = min(2, n - (i - 1), i) if i > 0 else 0

        if i > 0:
            st, s0 = sig[i], sig[i - 1]
            at = 1.0 - st
            h = _lam(st) - _lam(s0)
            phi1, b1, b2 = _phi_b(h)
            b_h = phi1
            out["gate_c"][i] = 1.0
            out["a_c"][i] = st / max(s0, 1e-20)
            out["b_c"][i] = -at * phi1
            if oc >= 2:
                s1 = sig[i - 2]
                r = (_lam(s1) - _lam(s0)) / h
                c0 = (b1 - b2) / (1.0 - r)
                c1 = b1 - c0
                out["c_c"][i] = -at * b_h * c0 / r
                out["d_c"][i] = -at * b_h * c1
            else:
                out["c_c"][i] = 0.0
                out["d_c"][i] = -at * b_h * 0.5

        # predictor i -> i+1. At the final step sigma_{i+1} = 0: handled
        # analytically (a_p = 0, phi1 -> -1 => b_p = alpha_t = 1, c_p = 0).
        st, s0 = sig[i + 1], sig[i]
        at = 1.0 - st
        if st <= 0.0:
            out["a_p"][i] = 0.0
            out["b_p"][i] = at  # -at * phi1 with phi1 = expm1(-inf) = -1
            out["c_p"][i] = 0.0
        else:
            h = _lam(st) - _lam(s0)
            phi1, _, _ = _phi_b(h)
            b_h = phi1
            out["a_p"][i] = st / max(s0, 1e-20)
            out["b_p"][i] = -at * phi1
            if op >= 2:
                s1 = sig[i - 1]
                r = (_lam(s1) - _lam(s0)) / h
                out["c_p"][i] = -at * b_h * 0.5 / r
            else:
                out["c_p"][i] = 0.0
    return UniPCCoeffs(**{k: jnp.asarray(v, jnp.float32) for k, v in out.items()})


def unipc_schedule(
    num_inference_steps: int,
    shift: float = 5.0,
    num_train_timesteps: int = 1000,
) -> UniPCSchedule:
    """Sigma grid: linspace(sigma_max, 0, n+1)[:-1] shift-warped, + [0].

    sigma_max = (N-1)/N, matching reference init sigmas 1 - linspace(1, 1/N, N)[::-1]
    (fm_solvers_unipc.py:107-118) and set_timesteps (:182-207).
    """
    n_train = num_train_timesteps
    sigma_max = (n_train - 1) / n_train
    sig = np.linspace(sigma_max, 0.0, num_inference_steps + 1, dtype=np.float64)[:-1]
    sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    timesteps = sig * n_train
    sig = np.concatenate([sig, [0.0]])
    return UniPCSchedule(
        sigmas=jnp.asarray(sig, jnp.float32),
        timesteps=jnp.asarray(timesteps, jnp.float32),
        coeffs=_build_coeffs(sig),
        num_train_timesteps=n_train,
    )


def init_state(sample_shape, dtype=jnp.float32) -> UniPCState:
    z = jnp.zeros(sample_shape, dtype)
    return UniPCState(
        m0=z, m1=z, last_sample=z, step_index=jnp.zeros((), jnp.int32)
    )


def _apply(coef_slice, state: UniPCState, model_output, sample):
    """Core step given one row of the coefficient table (all scalars)."""
    c = coef_slice
    sample = sample.astype(jnp.float32)
    m_t = sample - c.sigma * model_output.astype(jnp.float32)
    corrected = (
        c.a_c * state.last_sample
        + c.b_c * state.m0
        + c.c_c * (state.m1 - state.m0)
        + c.d_c * (m_t - state.m0)
    )
    sample = jnp.where(c.gate_c > 0, corrected, sample)
    prev_sample = c.a_p * sample + c.b_p * m_t + c.c_p * (state.m0 - m_t)
    new_state = UniPCState(
        m0=m_t, m1=state.m0, last_sample=sample, step_index=state.step_index + 1
    )
    return prev_sample, new_state


def unipc_step(
    schedule: UniPCSchedule,
    state: UniPCState,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
) -> Tuple[jnp.ndarray, UniPCState]:
    """One predictor(-corrector) step at state.step_index (traced OK)."""
    i = state.step_index
    c = jax.tree.map(lambda a: a[i], schedule.coeffs)
    return _apply(c, state, model_output, sample)


def rollout(
    schedule: UniPCSchedule,
    velocity_fn,
    x_init: jnp.ndarray,
    num_steps: int | None = None,
    stop_index=None,
    extra_init=None,
):
    """Full (or truncated) denoising chain as one lax.scan over the table.

    velocity_fn(x, t_scalar) -> v. For PRFL's random mid-timestep truncation
    (train_prfl.py:639-699) pass a traced `stop_index`: steps with
    index >= stop_index become identity.

    extra_init: optional user carry threaded through the scan (e.g. the
    TeaCache gate + residual caches). When given, the signature becomes
    velocity_fn(x, t_scalar, step_i, extra) -> (v, extra) and rollout
    returns (x_final, state_final, extra_final). This is THE sampling scan —
    sample() and sample_teacache() both run through it, so the solver
    stepping cannot drift between the two paths.
    """
    n = schedule.num_steps if num_steps is None else num_steps
    coeffs = jax.tree.map(lambda a: a[:n], schedule.coeffs)
    state0 = init_state(x_init.shape, jnp.float32)

    def step(x, st, extra, i, t, c):
        if extra_init is None:
            v = velocity_fn(x, t)
        else:
            v, extra = velocity_fn(x, t, i, extra)
        x_next, st_next = _apply(c, st, v, x)  # _apply bumps step_index
        return x_next, st_next, extra

    def body(carry, xs):
        x, st, extra = carry
        i, t, c = xs
        if stop_index is None:
            return step(x, st, extra, i, t, c), None
        # truncated rollout: steps past stop_index SKIP the model call
        # entirely (lax.cond executes one branch), matching the reference's
        # early-stopping python loop cost, not just its semantics
        nxt = jax.lax.cond(
            i < stop_index,
            lambda op: step(*op, i, t, c),
            lambda op: op,
            (x, st, extra),
        )
        return nxt, None

    xs = (jnp.arange(n, dtype=jnp.int32), schedule.timesteps[:n], coeffs)
    (x_final, state_final, extra_final), _ = jax.lax.scan(
        body, (x_init.astype(jnp.float32), state0, extra_init), xs
    )
    if extra_init is None:
        return x_final, state_final
    return x_final, state_final, extra_final
