"""Distillation utilities: Euler subsolver + latent GAN discriminator heads.

Parity target: `diffusers_lite/utils/distill_utils.py` — EulerSolver
(:23-62, discrete Euler stepping over a subsampled sigma grid with
euler_step_to_target) and Discriminator/DiscriminatorHead Conv3d GAN heads
(:66-135). Latent/auxiliary in the reference (not used by the two main
workloads) but part of the component surface.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import chex
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def extract_into_tensor(a, t, x_shape):
    """Gather per-sample coefficients and broadcast to x's rank
    (distill_utils.py:7-10): a[t] reshaped to [B, 1, 1, ...]."""
    out = jnp.take(jnp.asarray(a), t, axis=0)
    return out.reshape(out.shape[0], *((1,) * (len(x_shape) - 1)))


def get_phase_endpoint(index: int, num_teacher_timesteps: int = 32,
                       multiphase: int = 8) -> int:
    """Multiphase-distillation phase endpoint for a teacher step index
    (distill_utils.py:12-21): floor the index to its phase boundary,
    capped at the last phase start."""
    interval = num_teacher_timesteps // multiphase
    max_endpoint = num_teacher_timesteps - interval
    if index >= max_endpoint:
        return max_endpoint
    return (index // interval) * interval


@chex.dataclass(frozen=True)
class EulerSolver:
    """Discrete Euler over a subsampled sigma grid (distill_utils.py:23-62).

    sigmas: [n_full+1] the full training grid; indices: [n_sub] the
    subsampled step indices (ascending positions into the full grid).
    """

    sigmas: jnp.ndarray
    indices: jnp.ndarray

    @classmethod
    def make(cls, sigmas: np.ndarray, timesteps: int, euler_timesteps: int):
        step_ratio = timesteps // euler_timesteps
        idx = (np.arange(1, euler_timesteps + 1) * step_ratio).round()[::-1]
        idx = (idx - 1).astype(np.int64)[::-1].copy()
        return cls(
            sigmas=jnp.asarray(sigmas, jnp.float32),
            indices=jnp.asarray(idx, jnp.int32),
        )

    def euler_step(self, sample, model_output, index):
        """x_{i+1} = x - v * (sigma_i - sigma_{i+1}) at subsampled index."""
        i = self.indices[index]
        i_next = jnp.where(index + 1 < self.indices.shape[0],
                           self.indices[jnp.minimum(index + 1,
                                                    self.indices.shape[0] - 1)],
                           self.sigmas.shape[0] - 1)
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i_next]
        return (sample.astype(jnp.float32)
                - model_output.astype(jnp.float32) * (sigma - sigma_next))

    def euler_step_to_target(self, sample, model_output, index, target_index):
        """Jump from subsampled step `index` directly to `target_index`."""
        sigma = self.sigmas[self.indices[index]]
        sigma_t = self.sigmas[self.indices[target_index]]
        return (sample.astype(jnp.float32)
                - model_output.astype(jnp.float32) * (sigma - sigma_t))


class DiscriminatorHead(nn.Module):
    """Conv GAN head over DiT features (distill_utils.py:66-103): two 1x1
    conv blocks with GroupNorm-ish normalization + a scalar conv output."""

    inner_dim: int = 1024

    @nn.compact
    def __call__(self, feat):
        # feat: [B, L, C]
        b, l, c = feat.shape
        x = feat.astype(jnp.float32)
        x = nn.Dense(self.inner_dim, name="conv1")(x)
        x = _group_norm(x, groups=32)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(self.inner_dim, name="conv2")(x) + x
        x = _group_norm(x, groups=32)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, name="conv_out")(x)  # [B, L, 1]


def _group_norm(x, groups=32, eps=1e-6):
    b, l, c = x.shape
    g = x.reshape(b, l, groups, c // groups)
    mean = g.mean(axis=-1, keepdims=True)
    var = g.var(axis=-1, keepdims=True)
    return ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(b, l, c)


class Discriminator(nn.Module):
    """Multi-head discriminator over several feature taps
    (distill_utils.py:106-135)."""

    num_heads: int = 3
    inner_dim: int = 1024

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        outs = []
        for i, f in enumerate(feats):
            outs.append(DiscriminatorHead(self.inner_dim,
                                          name=f"head_{i}")(f))
        return outs
