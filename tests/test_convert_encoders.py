"""Roundtrip tests for the encoder checkpoint converters (name + layout)."""

import numpy as np
import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models import clip as clip_mod
from hyvideo_prfl_tpu.models import t5 as t5_mod
from hyvideo_prfl_tpu.models import vae as vae_mod
from hyvideo_prfl_tpu.utils import convert_encoders as ce


def _trees_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_t5_roundtrip():
    cfg = t5_mod.tiny_t5()
    m = t5_mod.T5Encoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    state = ce.t5_flax_to_torch(jax.device_get(params), cfg)
    assert "blocks.0.attn.q.weight" in state
    assert "blocks.1.ffn.gate.0.weight" in state
    assert "blocks.0.pos_embedding.embedding.weight" in state
    back = ce.t5_torch_to_flax(state, cfg)
    _trees_equal(params, back)
    # functional: converted params produce identical outputs
    o1 = m.apply(params, ids)
    o2 = m.apply(back, ids)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_clip_roundtrip():
    cfg = clip_mod.tiny_clip()
    params = clip_mod.init_clip_params(cfg, jax.random.PRNGKey(0))
    state = ce.clip_flax_to_torch(jax.device_get(params), cfg)
    assert "visual.transformer.0.attn.to_qkv.weight" in state
    assert state["visual.patch_embedding.weight"].shape == (
        cfg.dim, 3, cfg.patch_size, cfg.patch_size)
    back = ce.clip_torch_to_flax(state, cfg)
    _trees_equal(params, back)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 3)) * 0.5
    m = clip_mod.CLIPVisionTower(cfg)
    np.testing.assert_allclose(
        np.asarray(m.apply(params, x)), np.asarray(m.apply(back, x)),
        atol=1e-5)


def test_vae_roundtrip():
    cfg = vae_mod.VAEConfig(dim=16)  # real topology, small width
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(0),
                                     t=5, h=32, w=32)
    state = ce.vae_flax_to_torch(jax.device_get(params), cfg)
    # reference Sequential key surface
    assert "encoder.downsamples.0.residual.0.gamma" in state
    assert "encoder.downsamples.2.resample.1.weight" in state  # after 2 res
    assert "decoder.upsamples.0.residual.2.weight" in state
    assert "encoder.middle.1.to_qkv.weight" in state
    assert state["encoder.conv1.weight"].shape[2:] == (3, 3, 3)
    back = ce.vae_torch_to_flax(state, cfg)
    _trees_equal(params, back)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 4, 16)) * 0.2
    m = vae_mod.WanVAE(cfg)
    o1 = m.apply(params, z, method=m.decode)
    o2 = m.apply(back, z, method=m.decode)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_reward_head_converters_roundtrip():
    """MLP + QueryAttention torch-format converters (released
    mlp_step_*.ckpt / query_attention_step_*.ckpt, network.py:216-217)."""
    import jax
    import numpy as np

    from hyvideo_prfl_tpu.models import reward as rw

    d = 64
    mlp = rw.RewardMLP().init(jax.random.PRNGKey(0), jnp.zeros((1, d)))
    state = ce.reward_mlp_flax_to_torch(jax.device_get(mlp))
    assert set(state) == {f"fc{i}.{k}" for i in (1, 2, 3)
                          for k in ("weight", "bias")}
    assert state["fc1.weight"].shape == (1024, d)
    back = ce.reward_mlp_torch_to_flax(state)
    for a, b in zip(jax.tree.leaves(mlp), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    qa_mod = rw.QueryAttention(feature_dim=d, num_heads=4,
                               return_type="query")
    qa = qa_mod.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, d)))
    state = ce.query_attention_flax_to_torch(jax.device_get(qa))
    assert state["multihead_attn.in_proj_weight"].shape == (3 * d, d)
    back = ce.query_attention_torch_to_flax(state)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, d), jnp.float32)
    o1 = qa_mod.apply(qa, x)
    o2 = qa_mod.apply(back, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_load_reward_head_torch_ckpt(tmp_path):
    """load_reward_head accepts released torch .ckpt files directly."""
    import jax
    import numpy as np
    import torch

    from hyvideo_prfl_tpu.models import reward as rw
    from hyvideo_prfl_tpu.utils import checkpoint as ck

    d = 32
    mlp = rw.RewardMLP().init(jax.random.PRNGKey(0), jnp.zeros((1, d)))
    state = ce.reward_mlp_flax_to_torch(jax.device_get(mlp))
    p = tmp_path / "mlp_step_100.ckpt"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state.items()}, p)
    tree = ck.load_reward_head(str(p), "mlp")
    for a, b in zip(jax.tree.leaves(mlp), jax.tree.leaves(tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
