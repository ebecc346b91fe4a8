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


def _mlp_proj_torch(state, clip, flf=False):
    """img_emb MLPProj (model.py:392-410): LN(1e-5) -> fc1 -> exact GELU ->
    fc2 -> LN(1e-5); flf2v stacks first+last frame tokens on the sequence
    axis and adds emb_pos."""
    x = clip
    if flf:
        b2, n, d = x.shape
        x = x.reshape(-1, 2 * n, d)
        x = x + torch.from_numpy(np.asarray(state["img_emb.emb_pos"])).double()
    x = _ln(x, eps=1e-5, w=_t(state, "img_emb.proj.0.weight"),
            b=_t(state, "img_emb.proj.0.bias"))
    x = _linear(x, state, "img_emb.proj.1")
    x = torch.nn.functional.gelu(x, approximate="none")
    x = _linear(x, state, "img_emb.proj.3")
    return _ln(x, eps=1e-5, w=_t(state, "img_emb.proj.4.weight"),
               b=_t(state, "img_emb.proj.4.bias"))


def torch_wan_forward(state, cfg, x_np, t_np, ctx_np, y_np=None,
                      clip_np=None):
    """Full forward in float64 torch from the converted state dict.

    i2v/flf2v (model.py:392-410 MLPProj, :251-253 context split + k_img
    branch): y_np concatenates on the channel axis; clip_np [B(*2), 257,
    1280] runs through img_emb and prepends image tokens to the context."""
    x = torch.from_numpy(x_np).double()  # [B, F, H, W, C]
    t = torch.from_numpy(t_np).double()
    ctx = torch.from_numpy(ctx_np).double()
    if y_np is not None:
        x = torch.cat([x, torch.from_numpy(y_np).double()], dim=-1)
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

    # i2v/flf2v: image tokens from MLPProj prepend to the text context
    img_len = 0
    if clip_np is not None:
        ctx_img = _mlp_proj_torch(
            state, torch.from_numpy(clip_np).double(),
            flf=cfg.model_type == "flf2v")
        img_len = ctx_img.shape[1]
        ctx = torch.cat([ctx_img, ctx], dim=1)

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

        # cross attention (with affine norm3); i2v splits the context at
        # len-512 and adds a k_img/v_img attention over the CLIP tokens
        # BEFORE the o projection (model.py:251-268)
        hn = _ln(h, w=_t(state, f"{p}.norm3.weight"),
                 b=_t(state, f"{p}.norm3.bias"))
        ctx_txt = ctx[:, img_len:]
        q = _rms(_linear(hn, state, f"{p}.cross_attn.q"),
                 _t(state, f"{p}.cross_attn.norm_q.weight"))
        k = _rms(_linear(ctx_txt, state, f"{p}.cross_attn.k"),
                 _t(state, f"{p}.cross_attn.norm_k.weight"))
        v = _linear(ctx_txt, state, f"{p}.cross_attn.v")
        lc = ctx_txt.shape[1]
        o = _attention(q.reshape(b, L, n, hd), k.reshape(b, lc, n, hd),
                       v.reshape(b, lc, n, hd)).reshape(b, L, cfg.dim)
        if img_len:
            ci = ctx[:, :img_len]
            k_img = _rms(_linear(ci, state, f"{p}.cross_attn.k_img"),
                         _t(state, f"{p}.cross_attn.norm_k_img.weight"))
            v_img = _linear(ci, state, f"{p}.cross_attn.v_img")
            o = o + _attention(
                q.reshape(b, L, n, hd), k_img.reshape(b, img_len, n, hd),
                v_img.reshape(b, img_len, n, hd)).reshape(b, L, cfg.dim)
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


def _oracle_case(model_type):
    """Converter roundtrip + forward parity for the i2v/flf2v key surface
    (VERDICT r2 item 3): k_img/v_img/norm_k_img, MLPProj (+emb_pos), and
    the 36-channel conditioning concat get numerical coverage without
    released weights."""
    cfg = wan_dit.tiny_test(model_type=model_type, in_dim=36,
                            remat=False, compute_dtype=jnp.float32)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(1), hk.shape) * 0.05)
    # randomize the zero-init emb_pos so the flf2v path has signal
    if model_type == "flf2v":
        ep = params["params"]["img_emb"]["emb_pos"]
        params["params"]["img_emb"]["emb_pos"] = (
            jax.random.normal(jax.random.PRNGKey(2), ep.shape) * 0.1)

    state = ck.flax_to_torch_state(jax.device_get(params), cfg)
    # converter must emit the full i2v key surface
    assert "blocks.0.cross_attn.k_img.weight" in state
    assert "img_emb.proj.1.weight" in state
    if model_type == "flf2v":
        assert "img_emb.emb_pos" in state
    # and round-trip exactly
    rt = ck.torch_state_to_flax(state, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 8, 8, 16).astype(np.float32)
    y = (rng.randn(1, 4, 8, 8, 20) * 0.3).astype(np.float32)
    t = np.asarray([250.0], np.float32)
    ctx = (rng.randn(1, cfg.text_len, cfg.text_dim) * 0.2).astype(np.float32)
    nclip = 2 if model_type == "flf2v" else 1
    clip = (rng.randn(nclip, 257, 1280) * 0.2).astype(np.float32)

    ours = np.asarray(wan_dit.WanModel(cfg).apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        y=jnp.asarray(y), clip_fea=jnp.asarray(clip)))
    oracle = torch_wan_forward(state, cfg, x, t, ctx, y_np=y, clip_np=clip)
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=2e-3)


def test_flax_matches_torch_oracle_i2v():
    _oracle_case("i2v")


def test_flax_matches_torch_oracle_flf2v():
    _oracle_case("flf2v")
