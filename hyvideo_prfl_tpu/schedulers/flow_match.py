"""Flow-matching discrete scheduler as pure JAX functions.

Behavioral parity target: reference
`diffusers_lite/schedulers/scheduling_flow_match_discrete.py:34-275`
(FlowMatchDiscreteScheduler). Unlike the reference's stateful class, the
schedule here is an immutable pytree (`FlowMatchSchedule`) and every operation
is a pure function, so denoising rollouts compile into a single
`lax.scan`/`fori_loop` with the step index as a traced carry.

Semantics (reference line cites):
* train sigmas: linspace(sigma_max, 0, N+1); timesteps = sigmas[:-1] * N
  (scheduling_flow_match_discrete.py:48-55)
* inference sigmas: linspace warped by shift: s*sigma/(1+(s-1)*sigma)
  (scheduling_flow_match_discrete.py:91-92)
* Euler step: x_{i+1} = x_i + v * (sigma_{i+1} - sigma_i), fp32
  (scheduling_flow_match_discrete.py:150-158)
* add_noise: (1-sigma)*x0 + sigma*eps (:242-249)
* target: v = eps - x0 (:251-257)
* get_x0: x - sigma_t * v (:266-275)
* timestep sampling: logit-normal or uniform over [0, N) (:175-199)
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class FlowMatchSchedule:
    """Immutable flow-matching schedule.

    sigmas has length num_steps + 1 (ending at 0); timesteps has length
    num_steps and is what the model consumes.
    """

    sigmas: jnp.ndarray  # [num_steps + 1] fp32
    timesteps: jnp.ndarray  # [num_steps] fp32
    num_train_timesteps: int = 1000

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def train_schedule(
    num_train_timesteps: int = 1000,
    sigma_max: float = 1.0,
    reverse: bool = True,
) -> FlowMatchSchedule:
    """Training schedule: linear sigmas sigma_max -> 0 (no shift warp)."""
    sigmas = jnp.linspace(sigma_max, 0.0, num_train_timesteps + 1, dtype=jnp.float32)
    if not reverse:
        sigmas = sigmas[::-1]
    timesteps = sigmas[:-1] * num_train_timesteps
    return FlowMatchSchedule(
        sigmas=sigmas,
        timesteps=timesteps.astype(jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )


def inference_schedule(
    num_inference_steps: int,
    shift: float = 1.0,
    num_train_timesteps: int = 1000,
    sigma_max: float = 1.0,
    reverse: bool = True,
) -> FlowMatchSchedule:
    """Inference schedule with shift warp s*sigma / (1 + (s-1)*sigma)."""
    sigmas = jnp.linspace(sigma_max, 0.0, num_inference_steps + 1, dtype=jnp.float32)
    sigmas = (shift * sigmas) / (1.0 + (shift - 1.0) * sigmas)
    if not reverse:
        sigmas = 1.0 - sigmas
    timesteps = sigmas[:-1] * num_train_timesteps
    return FlowMatchSchedule(
        sigmas=sigmas,
        timesteps=timesteps.astype(jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )


def euler_step(
    schedule: FlowMatchSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    step_index: jnp.ndarray,
) -> jnp.ndarray:
    """One Euler step x += v * dt at a (traced) integer step index. fp32."""
    sigma = schedule.sigmas[step_index]
    sigma_next = schedule.sigmas[step_index + 1]
    dt = sigma_next - sigma
    return sample.astype(jnp.float32) + model_output.astype(jnp.float32) * dt


def add_noise(
    original_samples: jnp.ndarray, noise: jnp.ndarray, sigma: jnp.ndarray
) -> jnp.ndarray:
    """x_sigma = (1 - sigma) * x0 + sigma * eps."""
    return (1.0 - sigma) * original_samples + sigma * noise


def train_target(original_samples: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Flow-matching velocity target v = eps - x0."""
    return noise - original_samples


def loss_weighting(sigma: jnp.ndarray) -> jnp.ndarray:
    return jnp.ones_like(sigma)


def get_x0(
    model_output: jnp.ndarray, sample: jnp.ndarray, sigma_t: jnp.ndarray
) -> jnp.ndarray:
    """One-shot x0 estimate: x + v * (0 - sigma_t)."""
    return sample.astype(jnp.float32) - model_output.astype(jnp.float32) * sigma_t


def sample_train_timestep(
    key: jax.Array,
    schedule: FlowMatchSchedule,
    batch_size: int,
    weighting_scheme: str = "logit_normal",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw (timestep, sigma) for training.

    logit_normal: u = sigmoid(N(mean, std)); uniform: u ~ U[0,1).
    index = floor(u * num_train_timesteps).
    """
    if weighting_scheme == "logit_normal":
        u = jax.random.normal(key, (batch_size,)) * logit_std + logit_mean
        u = jax.nn.sigmoid(u)
    else:
        u = jax.random.uniform(key, (batch_size,))
    indices = jnp.clip(
        (u * schedule.num_train_timesteps).astype(jnp.int32),
        0,
        schedule.num_steps - 1,
    )
    return schedule.timesteps[indices], schedule.sigmas[indices]


def sigma_for_timestep(
    schedule: FlowMatchSchedule, timestep: jnp.ndarray
) -> jnp.ndarray:
    """Look up sigma for given timestep value(s) on the train schedule.

    The reference scans `timesteps == t` (scheduling_flow_match_discrete.py:235);
    on the linear train schedule this is equivalently index = round(t * N/(N-1))
    ... but we keep exact parity by nearest-match search (static-shape argmin).
    """
    timestep = jnp.atleast_1d(jnp.asarray(timestep, jnp.float32))
    diff = jnp.abs(schedule.timesteps[None, :] - timestep[:, None])
    idx = jnp.argmin(diff, axis=1)
    return schedule.sigmas[idx]
