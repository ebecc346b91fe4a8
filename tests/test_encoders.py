"""T5 + CLIP encoder tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models import t5 as t5_mod
from hyvideo_prfl_tpu.models import clip as clip_mod


def test_t5_encoder_shapes_and_mask():
    cfg = t5_mod.tiny_t5()
    model = t5_mod.T5Encoder(cfg)
    ids = jnp.asarray([[5, 8, 9, 0, 0], [3, 0, 0, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (2, 5, cfg.dim)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # masked positions must not influence valid positions:
    ids2 = ids.at[0, 3].set(999)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out[0, :3]), np.asarray(out2[0, :3]), atol=1e-5
    )


def test_t5_relative_buckets_symmetry():
    b = t5_mod._relative_buckets_np(8, 8, 32)
    assert b.shape == (8, 8)
    assert b.max() < 32 and b.min() >= 0
    # diagonal is bucket 0; forward and backward use disjoint bucket halves
    assert (np.diag(b) == 0).all()
    assert b[0, 5] >= 16 and b[5, 0] < 16


def test_t5_umt5_xxl_config():
    cfg = t5_mod.umt5_xxl()
    assert cfg.dim == 4096 and cfg.num_layers == 24
    assert cfg.vocab_size == 256384 and not cfg.shared_pos


def test_clip_vision_tokens():
    cfg = clip_mod.tiny_clip()
    params = clip_mod.init_clip_params(cfg, jax.random.PRNGKey(0))
    model = clip_mod.CLIPVisionTower(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3)) * 0.5
    out = model.apply(params, x)  # use_31_block default
    assert out.shape == (2, 1 + 4, cfg.dim)  # (28/14)^2 = 4 patches + cls
    assert np.isfinite(np.asarray(out)).all()
    full = model.apply(params, x, use_31_block=False)
    assert full.shape == out.shape
    assert float(jnp.abs(full - out).max()) > 1e-6  # one more block applied


def test_clip_vit_h_14_token_count():
    cfg = clip_mod.vit_h_14()
    assert cfg.num_patches + 1 == 257  # the i2v conditioning token count


def test_clip_preprocess_range():
    frames = np.zeros((1, 14, 14, 3), np.float32)  # -1..1 gray
    out = clip_mod.preprocess_frames(frames, image_size=28)
    assert out.shape == (1, 28, 28, 3)
    expected = (0.5 - clip_mod.CLIP_MEAN) / clip_mod.CLIP_STD
    np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-5)
