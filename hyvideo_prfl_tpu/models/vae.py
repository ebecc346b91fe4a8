"""Causal 3D video VAE (Wan2.1), TPU-native whole-clip formulation.

Parity target: reference `wan/modules/vae.py` (WanVAE_/Encoder3d/Decoder3d).

The reference streams the clip through the network in chunks of (1, 4, 4, ...)
frames with a per-conv `feat_cache` of the last CACHE_T=2 frames
(vae.py:517-569) purely to bound GPU memory. The cache semantics define the
real network; the non-cache forward path even skips temporal up/down-sampling
entirely. Here we compile the *whole clip at once* — XLA pipelines the convs
and `remat` bounds memory — implementing the cache-mode semantics exactly:

* CausalConv3d == conv with left-only temporal zero-padding (vae.py:18-37).
* downsample3d: spatial stride-2 conv first, then frame 0 passes through
  UNCONVOLVED and frames >=1 go through a k=3 stride-2 time conv whose
  windows are (t-2, t-1, t) for t = 2, 4, ... (vae.py:144-160: chunk 0 only
  primes the cache).
* upsample3d: time conv first: frame 0 bypasses (1 frame, not doubled) and
  is REPLACED BY ZERO in the conv input stream of later frames (chunk 0
  stores the 'Rep' marker, not data: vae.py:104-133); each frame t>=1 maps
  to 2 output frames via the 2C-channel split-interleave (vae.py:135-138);
  then nearest-2x spatial upsample + conv.
* RMS_norm == L2-normalize over channels * sqrt(C) * gamma (vae.py:40-55).
* AttentionBlock: per-frame single-head spatial attention, zero-init
  projection (vae.py:224-263).

Config (the shipped Wan2.1_VAE: _video_vae, vae.py:593-617): dim=96,
z_dim=16, dim_mult=[1,2,4,4], 2 res blocks, no attn scales,
temporal_downsample=[False, True, True]  => stride (4, 8, 8), 16 latent
channels, per-channel latent mean/std constants (vae.py:630-640).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.sharding import SP_AXIS

# latent normalization constants (vae.py:630-637)
LATENT_MEAN = np.asarray([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
LATENT_STD = np.asarray([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    compute_dtype: Any = jnp.float32
    # spatial context parallelism: shard activations on W over the sp mesh
    # axis; XLA inserts conv halo exchanges automatically — the GSPMD
    # equivalent of the reference's hand-written halo plugins
    # (wan/modules/context_parallel/plugins.py:84-291, SURVEY.md 2.8 P6).
    spatial_shard: bool = False

    @property
    def temporal_upsample(self):
        return tuple(reversed(self.temporal_downsample))


def _shard_w(x, cfg):
    """Constrain [B, T, H, W, C] activations to W-sharding when enabled."""
    if not cfg.spatial_shard:
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, P(None, None, None, SP_AXIS, None))


def tiny_vae(**kw):
    kw.setdefault("dim", 16)
    kw.setdefault("z_dim", 4)
    kw.setdefault("dim_mult", (1, 2))
    kw.setdefault("num_res_blocks", 1)
    kw.setdefault("temporal_downsample", (True,))
    return VAEConfig(**kw)


def _causal_conv(name, features, kernel=(3, 3, 3), strides=(1, 1, 1),
                 dtype=jnp.float32):
    kt, kh, kw = kernel
    pad = [(kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    return nn.Conv(features, kernel_size=kernel, strides=strides,
                   padding=pad, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


def _rms_norm_vae(x, gamma, eps=1e-12):
    """F.normalize over channels * sqrt(C) * gamma (vae.py:52-55)."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    y = xf / jnp.maximum(norm, eps) * jnp.sqrt(jnp.asarray(c, jnp.float32))
    return (y * gamma.astype(jnp.float32)).astype(x.dtype)


class ResBlock(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        g1 = self.param("norm1_gamma", nn.initializers.ones, (in_dim,))
        h = _rms_norm_vae(x, g1)
        h = nn.silu(h)
        h = _causal_conv("conv1", self.out_dim, dtype=self.dtype)(h)
        g2 = self.param("norm2_gamma", nn.initializers.ones, (self.out_dim,))
        h = _rms_norm_vae(h, g2)
        h = nn.silu(h)
        h = _causal_conv("conv2", self.out_dim, dtype=self.dtype)(h)
        if in_dim != self.out_dim:
            x = _causal_conv("shortcut", self.out_dim, kernel=(1, 1, 1),
                             dtype=self.dtype)(x)
        return x + h


class SpatialAttention(nn.Module):
    """Per-frame single-head spatial attention (vae.py:224-263)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        g = self.param("norm_gamma", nn.initializers.ones, (c,))
        y = _rms_norm_vae(x, g).reshape(b * t, h * w, c)
        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32,
                       name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(c, jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bqk,bkc->bqc", probs, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros_init(), name="proj")(o)
        return x + o.reshape(b, t, h, w, c)


class Downsample(nn.Module):
    temporal: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        # spatial: ZeroPad2d (0,1,0,1) + k3 s2 conv, per frame (vae.py:88-95)
        xs = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        xs = nn.Conv(c, (1, 3, 3), strides=(1, 2, 2), padding="VALID",
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="conv_spatial")(xs)
        if not self.temporal:
            return xs
        # temporal: frame 0 bypass + k3 s2 time conv at t = 2, 4, ...
        y = nn.Conv(c, (3, 1, 1), strides=(2, 1, 1), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="time_conv")(xs)
        return jnp.concatenate([xs[:, :1], y], axis=1)


class Upsample(nn.Module):
    temporal: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if self.temporal:
            # frame 0 zeroed in the conv stream; frames >= 1 doubled
            x_stream = jnp.concatenate(
                [jnp.zeros_like(x[:, :1]), x[:, 1:]], axis=1
            )
            y = _causal_conv("time_conv", c * 2, kernel=(3, 1, 1),
                             dtype=self.dtype)(x_stream)
            # channel split-interleave: [first_half_t, second_half_t] pairs
            y = y.reshape(b, t, h, w, 2, c)
            y = jnp.moveaxis(y, 4, 2).reshape(b, t * 2, h, w, c)
            # frame 0 bypass (not doubled): drop the 2 frames from t=0,
            # keep original frame 0
            x = jnp.concatenate([x[:, :1], y[:, 2:]], axis=1)
            t = x.shape[1]
        # nearest-exact 2x spatial + conv to c//2 (vae.py:77-86)
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x = nn.Conv(c // 2, (1, 3, 3), padding=[(0, 0), (1, 1), (1, 1)],
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_spatial")(x)
        return x


class Encoder3d(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        scale = 1.0
        x = _causal_conv("conv1", dims[0], dtype=dt)(x.astype(dt))
        bi = 0
        for i in range(len(cfg.dim_mult)):
            out_dim = dims[i + 1]
            for _ in range(cfg.num_res_blocks):
                x = _shard_w(ResBlock(out_dim, dt, name=f"block_{bi}")(x), cfg)
                bi += 1
                if scale in cfg.attn_scales:
                    x = SpatialAttention(dt, name=f"attn_{bi}")(x)
            if i != len(cfg.dim_mult) - 1:
                x = _shard_w(Downsample(cfg.temporal_downsample[i], dt,
                                        name=f"down_{i}")(x), cfg)
                scale /= 2.0
        x = ResBlock(dims[-1], dt, name="mid_block_0")(x)
        x = SpatialAttention(dt, name="mid_attn")(x)
        x = ResBlock(dims[-1], dt, name="mid_block_1")(x)
        g = self.param("head_norm_gamma", nn.initializers.ones, (dims[-1],))
        x = _rms_norm_vae(x, g)
        x = nn.silu(x)
        return _causal_conv("head_conv", cfg.z_dim * 2, dtype=dt)(x)


class Decoder3d(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        mult = tuple(cfg.dim_mult)
        dims = [cfg.dim * u for u in (mult[-1],) + tuple(reversed(mult))]
        x = _causal_conv("conv1", dims[0], dtype=dt)(x.astype(dt))
        x = ResBlock(dims[0], dt, name="mid_block_0")(x)
        x = SpatialAttention(dt, name="mid_attn")(x)
        x = ResBlock(dims[0], dt, name="mid_block_1")(x)
        bi = 0
        scale = 1.0 / 2 ** (len(mult) - 2)
        for i in range(len(mult)):
            out_dim = dims[i + 1]
            for _ in range(cfg.num_res_blocks + 1):
                x = _shard_w(ResBlock(out_dim, dt, name=f"block_{bi}")(x), cfg)
                bi += 1
                if scale in cfg.attn_scales:
                    x = SpatialAttention(dt, name=f"attn_{bi}")(x)
            if i != len(mult) - 1:
                x = _shard_w(Upsample(cfg.temporal_upsample[i], dt,
                                      name=f"up_{i}")(x), cfg)
                scale *= 2.0
        g = self.param("head_norm_gamma", nn.initializers.ones, (x.shape[-1],))
        x = _rms_norm_vae(x, g)
        x = nn.silu(x)
        return _causal_conv("head_conv", 3, dtype=dt)(x)


class WanVAE(nn.Module):
    """encode: video [B,T,H,W,3] -> normalized latents [B,T',H/8,W/8,z];
    decode: the inverse (vae.py:484-569 + scale handling :630-641)."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder3d(self.cfg, name="encoder")
        self.decoder = Decoder3d(self.cfg, name="decoder")
        # 1x1 convs around the bottleneck (vae.py:506-507)
        self.conv1 = _causal_conv("conv1", self.cfg.z_dim * 2, (1, 1, 1),
                                  dtype=self.cfg.compute_dtype)
        self.conv2 = _causal_conv("conv2", self.cfg.z_dim, (1, 1, 1),
                                  dtype=self.cfg.compute_dtype)

    def _scale(self):
        if self.cfg.z_dim == 16:
            return jnp.asarray(LATENT_MEAN), jnp.asarray(LATENT_STD)
        return (jnp.zeros((self.cfg.z_dim,), jnp.float32),
                jnp.ones((self.cfg.z_dim,), jnp.float32))

    def encode(self, video):
        mean, std = self._scale()
        out = self.encoder(video)
        mu, _log_var = jnp.split(self.conv1(out), 2, axis=-1)
        return ((mu.astype(jnp.float32) - mean) / std)

    def decode(self, z):
        mean, std = self._scale()
        z = z.astype(jnp.float32) * std + mean
        x = self.conv2(z)
        x = self.decoder(x)
        return jnp.clip(x.astype(jnp.float32), -1.0, 1.0)

    def __call__(self, video):
        return self.decode(self.encode(video))


def init_vae_params(cfg: VAEConfig, rng, t=5, h=32, w=32):
    model = WanVAE(cfg)
    x = jnp.zeros((1, t, h, w, 3), jnp.float32)
    return model.init(rng, x)
