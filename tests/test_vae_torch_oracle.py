"""VAE decode parity vs an independent torch oracle.

Builds a minimal PyTorch implementation of the reference WanVAE decoder
math (from the documented equations in /root/reference/diffusers_lite/wan/
modules/vae.py: causal 3D convs with (kt-1, 0) temporal padding, channel
F.normalize RMS norm * sqrt(C) * gamma, silu, temporal upsample with
frame-0 bypass + channel split-interleave, nearest-exact 2x spatial
upsample, per-frame single-head attention in the middle) — written fresh
for this test, no diffusers/reference imports — then loads OUR params
exported through `vae_flax_to_torch` (the reference on-disk format) and
compares decoded pixels against the flax model.

This validates the decoder math AND the flax->torch VAE converter
numerically in one shot (VERDICT r2 'What's missing' #1: a converter bug
on decoder keys would otherwise only surface as wrong pixels on real
weights).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hyvideo_prfl_tpu.models import vae as vae_mod  # noqa: E402
from hyvideo_prfl_tpu.utils import convert_encoders as ce  # noqa: E402


def _w(state, key):
    return torch.from_numpy(np.ascontiguousarray(state[key])).double()


def _causal_conv3d(state, key, x, stride=(1, 1, 1)):
    w, b = _w(state, key + ".weight"), _w(state, key + ".bias")
    kt, kh, kw = w.shape[2:]
    x = torch.nn.functional.pad(
        x, (kw // 2, kw // 2, kh // 2, kh // 2, kt - 1, 0))
    return torch.nn.functional.conv3d(x, w, b, stride=stride)


def _rms(state, key, x):
    """F.normalize over channels * sqrt(C) * gamma (reference RMS_norm)."""
    gamma = _w(state, key).reshape(1, -1, *([1] * (x.dim() - 2)))
    norm = x.pow(2).sum(dim=1, keepdim=True).sqrt().clamp(min=1e-12)
    return x / norm * np.sqrt(x.shape[1]) * gamma


def _res(state, pfx, x):
    h = torch.nn.functional.silu(_rms(state, pfx + ".residual.0.gamma", x))
    h = _causal_conv3d(state, pfx + ".residual.2", h)
    h = torch.nn.functional.silu(_rms(state, pfx + ".residual.3.gamma", h))
    h = _causal_conv3d(state, pfx + ".residual.6", h)
    if pfx + ".shortcut.weight" in state:
        x = _causal_conv3d(state, pfx + ".shortcut", x)
    return x + h


def _attn(state, pfx, x):
    b, c, t, h, w = x.shape
    y = _rms(state, pfx + ".norm.gamma", x)
    y = y.permute(0, 2, 3, 4, 1).reshape(b * t, h * w, c)
    qkv_w = _w(state, pfx + ".to_qkv.weight")[:, :, 0, 0]  # [3C, C]
    qkv = y @ qkv_w.T + _w(state, pfx + ".to_qkv.bias")
    q, k, v = qkv.chunk(3, dim=-1)
    probs = torch.softmax(q @ k.transpose(1, 2) / np.sqrt(c), dim=-1)
    o = probs @ v
    proj_w = _w(state, pfx + ".proj.weight")[:, :, 0, 0]
    o = o @ proj_w.T + _w(state, pfx + ".proj.bias")
    o = o.reshape(b, t, h, w, c).permute(0, 4, 1, 2, 3)
    return x + o


def _upsample(state, pfx, x, temporal):
    b, c, t, h, w = x.shape
    if temporal:
        xs = torch.cat([torch.zeros_like(x[:, :, :1]), x[:, :, 1:]], dim=2)
        y = _causal_conv3d(state, pfx + ".time_conv", xs)  # [B, 2C, T, H, W]
        # channel split-interleave: frame 2t+j <- group j of input frame t
        y = y.view(b, 2, c, t, h, w).permute(0, 2, 3, 1, 4, 5)
        y = y.reshape(b, c, 2 * t, h, w)
        x = torch.cat([x[:, :, :1], y[:, :, 2:]], dim=2)
        t = x.shape[2]
    # nearest-exact 2x spatial + per-frame conv2d to C//2
    x = x.repeat_interleave(2, dim=3).repeat_interleave(2, dim=4)
    w2, b2 = _w(state, pfx + ".resample.1.weight"), \
        _w(state, pfx + ".resample.1.bias")
    xf = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, 2 * h, 2 * w)
    xf = torch.nn.functional.conv2d(xf, w2, b2, padding=1)
    return xf.reshape(b, t, c // 2, 2 * h, 2 * w).permute(0, 2, 1, 3, 4)


def _oracle_decode(state, cfg, z):
    """z: [B, T, H, W, C] channel-last numpy -> pixels, same layout."""
    x = torch.from_numpy(np.array(z)).double().permute(0, 4, 1, 2, 3)
    x = _causal_conv3d(state, "conv2", x)
    x = _causal_conv3d(state, "decoder.conv1", x)
    x = _res(state, "decoder.middle.0", x)
    x = _attn(state, "decoder.middle.1", x)
    x = _res(state, "decoder.middle.2", x)
    mult = tuple(cfg.dim_mult)
    up_flags = cfg.temporal_upsample
    seq = 0
    for i in range(len(mult)):
        for _ in range(cfg.num_res_blocks + 1):
            x = _res(state, f"decoder.upsamples.{seq}", x)
            seq += 1
        if i != len(mult) - 1:
            x = _upsample(state, f"decoder.upsamples.{seq}", x, up_flags[i])
            seq += 1
    x = torch.nn.functional.silu(_rms(state, "decoder.head.0.gamma", x))
    x = _causal_conv3d(state, "decoder.head.2", x)
    x = x.clamp(-1.0, 1.0)
    return x.permute(0, 2, 3, 4, 1).numpy()


def test_vae_decode_matches_torch_oracle():
    cfg = vae_mod.tiny_vae()
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(7),
                                     t=5, h=16, w=16)
    state = ce.vae_flax_to_torch(params, cfg)

    z = np.asarray(
        jax.random.normal(jax.random.PRNGKey(8), (1, 3, 4, 4, cfg.z_dim),
                          jnp.float32))
    ours = np.asarray(vae_mod.WanVAE(cfg).apply(
        params, jnp.asarray(z), method=vae_mod.WanVAE.decode))
    oracle = _oracle_decode(state, cfg, z)
    assert ours.shape == oracle.shape  # [1, 2*3-1, 32, 32, 3]
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)


def test_vae_decode_oracle_full_arch_slice():
    """Full 4-stage architecture (2 temporal upsamples, shortcut resblocks,
    z_dim 16 => the real latent mean/std tables engage) at reduced width."""
    cfg = vae_mod.VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2),
                            num_res_blocks=1,
                            temporal_downsample=(False, True, True))
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(9),
                                     t=5, h=32, w=32)
    state = ce.vae_flax_to_torch(params, cfg)

    z = np.asarray(
        jax.random.normal(jax.random.PRNGKey(10), (1, 2, 4, 4, 16),
                          jnp.float32))
    mean = np.asarray(vae_mod.LATENT_MEAN)
    std = np.asarray(vae_mod.LATENT_STD)
    ours = np.asarray(vae_mod.WanVAE(cfg).apply(
        params, jnp.asarray(z), method=vae_mod.WanVAE.decode))
    oracle = _oracle_decode(state, cfg, z * std + mean)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)


class _Ctx:
    """feat_cache/feat_idx of the reference encoder (vae.py:517-535):
    one slot per CausalConv3d call site, idx reset per chunk, caches kept."""

    def __init__(self):
        self.cache = {}
        self.idx = 0

    def nxt(self):
        i = self.idx
        self.idx += 1
        self.cache.setdefault(i, None)
        return i


def _enc_conv(ctx, state, key, x):
    """Cached CausalConv3d call site (reference ResidualBlock.forward
    pattern): keep the last CACHE_T=2 input frames across chunks; the conv
    front-pads (kt-1) minus the cached frames."""
    idx = ctx.nxt()
    cache = ctx.cache[idx]
    cache_x = x[:, :, -2:].clone()
    if cache_x.shape[2] < 2 and cache is not None:
        cache_x = torch.cat([cache[:, :, -1:], cache_x], dim=2)
    w, b = _w(state, key + ".weight"), _w(state, key + ".bias")
    kt, kh, kw = w.shape[2:]
    pad_t = kt - 1
    xin = x
    if cache is not None and pad_t > 0:
        xin = torch.cat([cache, x], dim=2)
        pad_t -= cache.shape[2]
    xin = torch.nn.functional.pad(
        xin, (kw // 2, kw // 2, kh // 2, kh // 2, max(pad_t, 0), 0))
    ctx.cache[idx] = cache_x
    return torch.nn.functional.conv3d(xin, w, b)


def _enc_res(ctx, state, pfx, x):
    h = x
    if pfx + ".shortcut.weight" in state:  # 1x1, uncached in the reference
        h = _causal_conv3d(state, pfx + ".shortcut", x)
    y = torch.nn.functional.silu(_rms(state, pfx + ".residual.0.gamma", x))
    y = _enc_conv(ctx, state, pfx + ".residual.2", y)
    y = torch.nn.functional.silu(_rms(state, pfx + ".residual.3.gamma", y))
    y = _enc_conv(ctx, state, pfx + ".residual.6", y)
    return h + y


def _enc_down(ctx, state, pfx, x, temporal):
    """downsample2d/3d (reference Resample.forward): ZeroPad2d((0,1,0,1)) +
    per-frame conv2d stride 2; downsample3d additionally runs the strided
    time_conv over [prev chunk's last frame, chunk] (first chunk bypasses
    and seeds the cache)."""
    b, c, t, h, w = x.shape
    xf = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    xf = torch.nn.functional.pad(xf, (0, 1, 0, 1))
    w2, b2 = _w(state, pfx + ".resample.1.weight"), \
        _w(state, pfx + ".resample.1.bias")
    xf = torch.nn.functional.conv2d(xf, w2, b2, stride=2)
    x = xf.reshape(b, t, *xf.shape[1:]).permute(0, 2, 1, 3, 4)
    if temporal:
        idx = ctx.nxt()
        cache = ctx.cache[idx]
        if cache is None:
            ctx.cache[idx] = x.clone()
        else:
            cache_x = x[:, :, -1:].clone()
            tw, tb = _w(state, pfx + ".time_conv.weight"), \
                _w(state, pfx + ".time_conv.bias")
            x = torch.nn.functional.conv3d(
                torch.cat([cache[:, :, -1:], x], 2), tw, tb,
                stride=(2, 1, 1))
            ctx.cache[idx] = cache_x
    return x


def _enc_chunk(ctx, state, cfg, x):
    x = _enc_conv(ctx, state, "encoder.conv1", x)
    seq = 0
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks):
            x = _enc_res(ctx, state, f"encoder.downsamples.{seq}", x)
            seq += 1
        if i != len(cfg.dim_mult) - 1:
            x = _enc_down(ctx, state, f"encoder.downsamples.{seq}", x,
                          cfg.temporal_downsample[i])
            seq += 1
    x = _enc_res(ctx, state, "encoder.middle.0", x)
    x = _attn(state, "encoder.middle.1", x)
    x = _enc_res(ctx, state, "encoder.middle.2", x)
    x = torch.nn.functional.silu(_rms(state, "encoder.head.0.gamma", x))
    return _enc_conv(ctx, state, "encoder.head.2", x)


def _oracle_encode(state, cfg, video):
    """video: [B, T, H, W, 3] channel-last numpy -> normalized mu, same
    layout. Chunked 1,4,4,... exactly as the reference encode
    (vae.py:517-541)."""
    x = torch.from_numpy(np.array(video)).double().permute(0, 4, 1, 2, 3)
    t = x.shape[2]
    ctx = _Ctx()
    outs = []
    for i in range(1 + (t - 1) // 4):
        ctx.idx = 0
        chunk = x[:, :, :1] if i == 0 else x[:, :, 1 + 4 * (i - 1):1 + 4 * i]
        outs.append(_enc_chunk(ctx, state, cfg, chunk))
    out = torch.cat(outs, 2)
    mu = _causal_conv3d(state, "conv1", out).chunk(2, dim=1)[0]
    if cfg.z_dim == 16:
        from hyvideo_prfl_tpu.models import vae as vm
        mean = torch.tensor(np.asarray(vm.LATENT_MEAN)).view(1, -1, 1, 1, 1)
        std = torch.tensor(np.asarray(vm.LATENT_STD)).view(1, -1, 1, 1, 1)
        mu = (mu - mean) / std
    return mu.permute(0, 2, 3, 4, 1).numpy()


def test_vae_encode_matches_torch_oracle():
    cfg = vae_mod.tiny_vae()
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(11),
                                     t=5, h=16, w=16)
    state = ce.vae_flax_to_torch(params, cfg)
    video = np.asarray(jax.random.normal(
        jax.random.PRNGKey(12), (1, 5, 16, 16, 3), jnp.float32)) * 0.5
    ours = np.asarray(vae_mod.WanVAE(cfg).apply(
        params, jnp.asarray(video), method=vae_mod.WanVAE.encode))
    oracle = _oracle_encode(state, cfg, video)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)


def test_vae_encode_oracle_full_arch_slice():
    """4-stage encoder (two temporal downsamples, shortcut resblocks,
    z_dim 16 => real latent normalization) at reduced width."""
    cfg = vae_mod.VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2),
                            num_res_blocks=1,
                            temporal_downsample=(False, True, True))
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(13),
                                     t=9, h=32, w=32)
    state = ce.vae_flax_to_torch(params, cfg)
    video = np.asarray(jax.random.normal(
        jax.random.PRNGKey(14), (1, 9, 32, 32, 3), jnp.float32)) * 0.5
    ours = np.asarray(vae_mod.WanVAE(cfg).apply(
        params, jnp.asarray(video), method=vae_mod.WanVAE.encode))
    oracle = _oracle_encode(state, cfg, video)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)
