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
