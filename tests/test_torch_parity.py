"""Numerical parity vs an independent torch oracle.

Builds a minimal PyTorch implementation of the Wan DiT forward math (from
the documented equations: adaLN modulation in fp32, RMS-normed qk + 3D RoPE
self attention, text cross attention, tanh-GELU FFN, modulated head) —
written fresh for this test, no diffusers/reference imports — then loads OUR
converted checkpoint into it and compares logits against the flax model.

This validates the model math AND the torch<->flax checkpoint converter in
one shot: if either mislabels a weight or diverges numerically, the outputs
split.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hyvideo_prfl_tpu.models import wan_dit  # noqa: E402
from hyvideo_prfl_tpu.utils import checkpoint as ck  # noqa: E402


def _t(state, key):
    return torch.from_numpy(np.ascontiguousarray(state[key])).double()


def _linear(x, state, prefix):
    return x @ _t(state, prefix + ".weight").T + _t(state, prefix + ".bias")


def _rms(x, w, eps=1e-6):
    y = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return y * w


def _ln(x, eps=1e-6, w=None, b=None):
    m = x.mean(-1, keepdim=True)
    v = x.var(-1, unbiased=False, keepdim=True)
    y = (x - m) * torch.rsqrt(v + eps)
    if w is not None:
        y = y * w + b
    return y


def _rope_tables_torch(grid, head_dim, theta=10000.0):
    f, h, w = grid
    c = head_dim // 2
    ct, ch, cw = c - 2 * (c // 3), c // 3, c // 3

    def freqs(n, dim):
        inv = 1.0 / torch.pow(
            torch.tensor(theta).double(),
            torch.arange(0, dim).double() / dim)
        return torch.outer(torch.arange(n).double(), inv)

    at, ah, aw = freqs(f, ct), freqs(h, ch), freqs(w, cw)
    ang = torch.cat([
        at[:, None, None, :].expand(f, h, w, ct),
        ah[None, :, None, :].expand(f, h, w, ch),
        aw[None, None, :, :].expand(f, h, w, cw),
    ], dim=-1).reshape(f * h * w, c)
    return torch.cos(ang), torch.sin(ang)


def _apply_rope_torch(x, cos, sin):
    # x: [B, L, N, D]; rotate adjacent (even, odd) pairs
    b, l, n, d = x.shape
    xe = x.reshape(b, l, n, d // 2, 2)
    e, o = xe[..., 0], xe[..., 1]
    cos_b = cos[None, :, None, :]
    sin_b = sin[None, :, None, :]
    return torch.stack(
        [e * cos_b - o * sin_b, e * sin_b + o * cos_b], dim=-1
    ).reshape(b, l, n, d)


def _attention(q, k, v):
    d = q.shape[-1]
    logits = torch.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(d)
    p = torch.softmax(logits, dim=-1)
    return torch.einsum("bnqk,bknd->bqnd", p, v)


def torch_wan_forward(state, cfg, x_np, t_np, ctx_np):
    """Full t2v forward in float64 torch from the converted state dict."""
    x = torch.from_numpy(x_np).double()  # [B, F, H, W, C]
    t = torch.from_numpy(t_np).double()
    ctx = torch.from_numpy(ctx_np).double()
    b, f, hh, ww, c_in = x.shape
    pt, ph, pw = cfg.patch_size
    gf, gh, gw = f // pt, hh // ph, ww // pw
    L = gf * gh * gw
    n, hd = cfg.num_heads, cfg.head_dim

    # patch embedding (Conv3d stride=kernel == patch matmul)
    wconv = _t(state, "patch_embedding.weight")  # [dim, c, pt, ph, pw]
    xp = x.reshape(b, gf, pt, gh, ph, gw, pw, c_in)
    xp = xp.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, L, pt * ph * pw * c_in)
    kern = wconv.permute(2, 3, 4, 1, 0).reshape(-1, cfg.dim)
    h = xp @ kern + _t(state, "patch_embedding.bias")

    # time embedding
    half = cfg.freq_dim // 2
    freqs = torch.pow(torch.tensor(10000.0).double(),
                      -torch.arange(half).double() / half)
    ang = torch.outer(t, freqs)
    e = torch.cat([torch.cos(ang), torch.sin(ang)], dim=1)
    e = _linear(e, state, "time_embedding.0")
    e = torch.nn.functional.silu(e)
    e = _linear(e, state, "time_embedding.2")
    e0 = torch.nn.functional.silu(e)
    e0 = _linear(e0, state, "time_projection.1").reshape(b, 6, cfg.dim)

    # text embedding (tanh gelu)
    ctx = _linear(ctx, state, "text_embedding.0")
    ctx = torch.nn.functional.gelu(ctx, approximate="tanh")
    ctx = _linear(ctx, state, "text_embedding.2")

    cos, sin = _rope_tables_torch((gf, gh, gw), hd)

    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        mod = _t(state, f"{p}.modulation")  # [1, 6, dim]
        e6 = mod + e0
        es = [e6[:, j:j + 1, :] for j in range(6)]

        # self attention
        hn = _ln(h) * (1 + es[1]) + es[0]
        q = _rms(_linear(hn, state, f"{p}.self_attn.q"),
                 _t(state, f"{p}.self_attn.norm_q.weight"))
        k = _rms(_linear(hn, state, f"{p}.self_attn.k"),
                 _t(state, f"{p}.self_attn.norm_k.weight"))
        v = _linear(hn, state, f"{p}.self_attn.v")
        q = _apply_rope_torch(q.reshape(b, L, n, hd), cos, sin)
        k = _apply_rope_torch(k.reshape(b, L, n, hd), cos, sin)
        o = _attention(q, k, v.reshape(b, L, n, hd)).reshape(b, L, cfg.dim)
        o = _linear(o, state, f"{p}.self_attn.o")
        h = h + o * es[2]

        # cross attention (with affine norm3)
        hn = _ln(h, w=_t(state, f"{p}.norm3.weight"),
                 b=_t(state, f"{p}.norm3.bias"))
        q = _rms(_linear(hn, state, f"{p}.cross_attn.q"),
                 _t(state, f"{p}.cross_attn.norm_q.weight"))
        k = _rms(_linear(ctx, state, f"{p}.cross_attn.k"),
                 _t(state, f"{p}.cross_attn.norm_k.weight"))
        v = _linear(ctx, state, f"{p}.cross_attn.v")
        lc = ctx.shape[1]
        o = _attention(q.reshape(b, L, n, hd), k.reshape(b, lc, n, hd),
                       v.reshape(b, lc, n, hd)).reshape(b, L, cfg.dim)
        h = h + _linear(o, state, f"{p}.cross_attn.o")

        # ffn
        hn = _ln(h) * (1 + es[4]) + es[3]
        y = _linear(hn, state, f"{p}.ffn.0")
        y = torch.nn.functional.gelu(y, approximate="tanh")
        y = _linear(y, state, f"{p}.ffn.2")
        h = h + y * es[5]

    # head
    mod = _t(state, "head.modulation")
    e2 = mod + e.unsqueeze(1)
    out = _ln(h) * (1 + e2[:, 1:2]) + e2[:, 0:1]
    out = _linear(out, state, "head.head")
    # unpatchify to [B, F, H, W, out]
    out = out.reshape(b, gf, gh, gw, pt, ph, pw, cfg.out_dim)
    out = out.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        b, gf * pt, gh * ph, gw * pw, cfg.out_dim)
    return out.numpy()


def test_flax_matches_torch_oracle():
    cfg = wan_dit.tiny_test(remat=False, compute_dtype=jnp.float32)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    # randomize the zero head so the comparison has signal
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(1), hk.shape) * 0.05)

    state = ck.flax_to_torch_state(jax.device_get(params), cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8, 16).astype(np.float32)
    t = np.asarray([321.0, 77.0], np.float32)
    ctx = (rng.randn(2, cfg.text_len, cfg.text_dim) * 0.2).astype(np.float32)

    ours = np.asarray(wan_dit.WanModel(cfg).apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))
    oracle = torch_wan_forward(state, cfg, x, t, ctx)

    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=2e-3)


def test_flax_matches_torch_oracle_bf16_close():
    """bf16 compute should stay within bf16-grade error of the fp64 oracle."""
    cfg = wan_dit.tiny_test(remat=False)  # bf16 compute
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(1), hk.shape) * 0.05)
    state = ck.flax_to_torch_state(jax.device_get(params), cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 8, 8, 16).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    ctx = (rng.randn(1, cfg.text_len, cfg.text_dim) * 0.2).astype(np.float32)
    ours = np.asarray(wan_dit.WanModel(cfg).apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))
    oracle = torch_wan_forward(state, cfg, x, t, ctx)
    err = np.abs(ours - oracle).max() / (np.abs(oracle).max() + 1e-9)
    assert err < 0.05, f"bf16 relative error too large: {err}"
