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


def infer_config(params) -> VAEConfig:
    """Reconstruct the VAEConfig from a params tree's shapes/structure —
    so standalone consumers (scripts/decode_latents.py, the trainer's
    subprocess sanity decode) work against ANY checkpoint (released full
    VAE or a tiny test one) without a config side-channel:
      dim       = encoder.conv1 out-channels
      z_dim     = top-level conv2 out-channels (the latent re-projection)
      stages    = 1 + number of encoder.down_i modules
      num_res_blocks = encoder block count / stages
      dim_mult[s]    = out-channels of stage s's first block / dim
      temporal_downsample[s] = down_s has a time_conv
    """
    enc = params["params"]["encoder"]
    dim = int(enc["conv1"]["kernel"].shape[-1])
    z_dim = int(params["params"]["conv2"]["kernel"].shape[-1])
    downs = sorted(int(k.split("_")[1]) for k in enc
                   if k.startswith("down_"))
    stages = len(downs) + 1
    blocks = sorted(int(k.split("_")[1]) for k in enc
                    if k.startswith("block_"))
    nrb = len(blocks) // stages
    dim_mult = tuple(
        int(enc[f"block_{s * nrb}"]["conv1"]["kernel"].shape[-1]) // dim
        for s in range(stages))
    tdown = tuple("time_conv" in enc[f"down_{i}"] for i in downs)
    return VAEConfig(dim=dim, z_dim=z_dim, dim_mult=dim_mult,
                     num_res_blocks=nrb, temporal_downsample=tdown)


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


# ---------------------------------------------------------------------------
# Streaming (chunked) decode — bounded memory for long / high-res clips
# ---------------------------------------------------------------------------
# The whole-clip decode above holds full-resolution activations for the
# entire clip (e.g. 96ch x 81f x 480p fp32 ≈ 11 GB per tensor): fine on a
# v5p, OOM on small chips. This is the TPU equivalent of the reference's
# per-conv feat_cache streaming (vae.py:545-569): decode ONE latent frame
# per step, carrying each causal conv's last CACHE_T=2 input frames as
# explicit state. Exact — streaming == whole-clip (test_vae.py pins it).
#
# Implementation: a pure function that mirrors Decoder3d layer-by-layer
# over the SAME param tree (names must match Decoder3d; the equivalence
# test catches drift). Two chunk shapes exist (frame 0 emits 1 frame,
# steady-state chunks emit 4), so jit compiles exactly two variants.


def _conv3d(p, x, temporal_pad=0, spatial="SAME", strides=(1, 1, 1)):
    """flax-Conv-compatible conv_general_dilated on a param dict.

    Runs in x.dtype (params cast at use): with the bf16 streaming option
    the convs, activations AND the carried caches are all bf16 — halving
    the decode working set (the fp32 720p x 81f stream needs ~8.4 GB of
    caches + 7.3 GB of temps, over a 16 GB chip's budget)."""
    k = p["kernel"].astype(x.dtype)
    kt, kh, kw = k.shape[0], k.shape[1], k.shape[2]
    if spatial == "SAME":
        pad = [(temporal_pad, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    else:
        pad = [(temporal_pad, 0), (0, 0), (0, 0)]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["bias"].astype(x.dtype)


class _Stream:
    """Per-conv temporal cache dict keyed by layer path."""

    def __init__(self, state=None):
        self.state = {} if state is None else dict(state)

    def causal(self, p, name, x, cache_t=2):
        """Causal kt=3 conv: prepend the cached last-2 input frames (zeros
        on the first chunk = the left pad), VALID in time."""
        cache = self.state.get(name)
        if cache is None:
            b, _, h, w, c = x.shape
            cache = jnp.zeros((b, cache_t, h, w, c), x.dtype)
        xin = jnp.concatenate([cache, x], axis=1)
        self.state[name] = xin[:, -cache_t:]
        return _conv3d(p, xin, temporal_pad=0)


def _res_block_stream(p, st, prefix, x):
    h = _rms_norm_vae(x, p["norm1_gamma"])
    h = nn.silu(h)
    h = st.causal(p["conv1"], f"{prefix}/conv1", h)
    h = _rms_norm_vae(h, p["norm2_gamma"])
    h = nn.silu(h)
    h = st.causal(p["conv2"], f"{prefix}/conv2", h)
    if "shortcut" in p:
        x = _conv3d(p["shortcut"], x)
    return x + h


def _attn_stream(p, x):
    b, t, h, w, c = x.shape
    y = _rms_norm_vae(x, p["norm_gamma"]).reshape(b * t, h * w, c)
    qkv = (y @ p["to_qkv"]["kernel"].astype(y.dtype)
           + p["to_qkv"]["bias"].astype(y.dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(c, jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = (o @ p["proj"]["kernel"].astype(o.dtype)
         + p["proj"]["bias"].astype(o.dtype))
    return x + o.reshape(b, t, h, w, c)


def _upsample_stream(p, st, prefix, x, temporal, first):
    b, t, h, w, c = x.shape
    if temporal and not first:
        # steady chunks: every frame doubles via the 2C split-interleave.
        # The zeroed frame-0 stream value (the 'Rep' semantics,
        # vae.py:104-138) coincides with the zero cache init, so the first
        # chunk (frame 0, bypassing un-doubled) never runs the time conv
        # and still leaves the correct cache state.
        y = st.causal(p["time_conv"], f"{prefix}/time_conv", x)
        y = y.reshape(b, t, h, w, 2, c)
        x = jnp.moveaxis(y, 4, 2).reshape(b, t * 2, h, w, c)
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return _conv3d(p["conv_spatial"], x)


def _decode_chunk(params, z, state, *, cfg: VAEConfig, first: bool,
                  dtype=jnp.float32):
    """Decode `z` [B, Tc, h, w, zdim] latent frames given stream state;
    returns (frames, new_state). Mirrors WanVAE.decode + Decoder3d.

    `dtype` is the stream compute dtype: bf16 halves activations, conv
    temps AND the carried caches (norms keep fp32 islands; the output is
    clipped fp32 either way) — the single-chip fallback for shapes whose
    fp32 stream exceeds HBM (720p x 81f needs ~16 GB fp32, ~8 GB bf16)."""
    p = params["params"]
    st = _Stream(state)
    mean, std = (jnp.asarray(LATENT_MEAN), jnp.asarray(LATENT_STD)) \
        if cfg.z_dim == 16 else (jnp.zeros((cfg.z_dim,)), jnp.ones((cfg.z_dim,)))
    x = (z.astype(jnp.float32) * std + mean).astype(dtype)
    x = _conv3d(p["conv2"], x)  # 1x1 bottleneck conv (kt=1: no cache)

    d = p["decoder"]
    mult = tuple(cfg.dim_mult)
    x = st.causal(d["conv1"], "conv1", x)
    x = _res_block_stream(d["mid_block_0"], st, "mid_block_0", x)
    x = _attn_stream(d["mid_attn"], x)
    x = _res_block_stream(d["mid_block_1"], st, "mid_block_1", x)
    bi = 0
    ups = cfg.temporal_upsample
    for i in range(len(mult)):
        for _ in range(cfg.num_res_blocks + 1):
            x = _res_block_stream(d[f"block_{bi}"], st, f"block_{bi}", x)
            bi += 1
        if i != len(mult) - 1:
            x = _upsample_stream(d[f"up_{i}"], st, f"up_{i}", x,
                                 temporal=ups[i], first=first)
    x = _rms_norm_vae(x, d["head_norm_gamma"])
    x = nn.silu(x)
    x = st.causal(d["head_conv"], "head_conv", x)
    return jnp.clip(x.astype(jnp.float32), -1.0, 1.0), st.state


def _downsample_stream(p, st, prefix, x, temporal, first):
    """Streaming Downsample (vae.py:144-160): spatial stride-2 conv per
    frame, then (if temporal) frame-0 bypass + k3 stride-2 time conv whose
    windows sit at even global positions. Steady-state chunks deliver an
    even number of frames; a 1-frame cache keeps the window phase: with
    cache [s_{2k}] and chunk [s_{2k+1}, s_{2k+2}, ...], VALID stride-2
    windows land at (s_{2k}, s_{2k+1}, s_{2k+2}), (s_{2k+2}, ...) — the
    even positions."""
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    xs = _conv3d(p["conv_spatial"], xs, spatial="VALID",
                 strides=(1, 2, 2))
    if not temporal:
        return xs
    name = f"{prefix}/time_conv"
    if first:
        st.state[name] = xs[:, -1:]
        return xs  # frame 0 bypasses the time conv
    xin = jnp.concatenate([st.state[name], xs], axis=1)
    st.state[name] = xin[:, -1:]
    y = jax.lax.conv_general_dilated(
        xin, p["time_conv"]["kernel"].astype(xin.dtype),
        window_strides=(2, 1, 1),
        padding=[(0, 0), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p["time_conv"]["bias"].astype(xin.dtype)
    return y


def _encode_chunk(params, x, state, *, cfg: VAEConfig, first: bool):
    """Encode `x` [B, Tc, H, W, 3] pixel frames (Tc=1 first, then chunks of
    4) given stream state; returns (latent frames, new_state). Mirrors
    WanVAE.encode + Encoder3d."""
    p = params["params"]
    st = _Stream(state)
    e = p["encoder"]
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    h = st.causal(e["conv1"], "conv1", x.astype(cfg.compute_dtype))
    bi = 0
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks):
            h = _res_block_stream(e[f"block_{bi}"], st, f"block_{bi}", h)
            bi += 1
        if i != len(cfg.dim_mult) - 1:
            h = _downsample_stream(e[f"down_{i}"], st, f"down_{i}", h,
                                   temporal=cfg.temporal_downsample[i],
                                   first=first)
    h = _res_block_stream(e["mid_block_0"], st, "mid_block_0", h)
    h = _attn_stream(e["mid_attn"], h)
    h = _res_block_stream(e["mid_block_1"], st, "mid_block_1", h)
    h = _rms_norm_vae(h, e["head_norm_gamma"])
    h = nn.silu(h)
    h = st.causal(e["head_conv"], "head_conv", h)
    out = _conv3d(p["conv1"], h)  # 1x1 bottleneck (kt=1: no cache)
    mu = jnp.split(out, 2, axis=-1)[0]
    mean, std = (jnp.asarray(LATENT_MEAN), jnp.asarray(LATENT_STD)) \
        if cfg.z_dim == 16 else (jnp.zeros((cfg.z_dim,)), jnp.ones((cfg.z_dim,)))
    return (mu.astype(jnp.float32) - mean) / std, st.state


def encode_streaming(params, cfg: VAEConfig, video,
                     frames_per_chunk: int = 4):
    """Memory-bounded encode: pixel frames stream 1 + 4k at a time (the
    reference's chunk pattern, vae.py:517-543), each steady chunk emitting
    latent frames. frames_per_chunk must be a multiple of the temporal
    stride (4 for the shipped config). Exactly equals WanVAE.encode."""
    t_stride = 2 ** sum(cfg.temporal_downsample)
    assert frames_per_chunk % t_stride == 0, (
        f"chunk {frames_per_chunk} must divide by temporal stride {t_stride}")
    fn = jax.jit(_encode_chunk, static_argnames=("cfg", "first"))
    outs = []
    state = {}
    t = video.shape[1]
    i = 0
    while i < t:
        n = 1 if i == 0 else min(frames_per_chunk, t - i)
        out, state = fn(params, video[:, i:i + n], state, cfg=cfg,
                        first=(i == 0))
        outs.append(out)
        i += n
    return jnp.concatenate(outs, axis=1)


def decode_streaming(params, cfg: VAEConfig, z, frames_per_chunk: int = 1,
                     dtype=jnp.float32, host_stream: bool = False):
    """Memory-bounded decode: latent frames stream through the decoder
    `frames_per_chunk` at a time (frame 0 always alone — its chunk shape
    differs). Peak memory is O(chunk) instead of O(clip). Exactly equals
    WanVAE.decode (the reference's chunked feat_cache path, vae.py:545-569).

    `dtype=jnp.bfloat16` halves the stream (activations + caches + conv
    temps; fp32 norm islands) — needed to fit 720p x 81f on a 16 GB chip.
    `host_stream=True` fetches each chunk's pixels to host as it completes
    and concatenates there (returns numpy): device memory then holds only
    the caches + one chunk, never the full clip.

    Params are jit ARGUMENTS (never closed over: the remote-compile
    backend rejects >~100MB HLO literal uploads). jit caches one variant
    per (chunk shape, state structure): 3 compiles in the common case.
    """
    fn = jax.jit(_decode_chunk, static_argnames=("cfg", "first", "dtype"))
    outs = []
    state = {}
    t = z.shape[1]
    i = 0
    while i < t:
        n = 1 if i == 0 else min(frames_per_chunk, t - i)
        out, state = fn(params, z[:, i:i + n], state, cfg=cfg,
                        first=(i == 0), dtype=dtype)
        if host_stream:
            out = np.asarray(out)
        outs.append(out)
        i += n
    if host_stream:
        return np.concatenate(outs, axis=1)
    return jnp.concatenate(outs, axis=1)
