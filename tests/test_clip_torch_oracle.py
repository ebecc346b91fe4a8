"""CLIP vision tower parity vs an independent torch oracle.

Minimal fp64 PyTorch reimplementation of the reference VisionTransformer
math (/root/reference/diffusers_lite/wan/modules/clip.py:210-301: biasless
patch conv under pre_norm, cls + learned pos embeddings, pre-LN blocks
with packed qkv and scaled softmax, exact GELU MLP, use_31_block
penultimate tap) — written fresh for this test — loading OUR params via
`clip_flax_to_torch` (the reference on-disk format). Validates the tower
math AND the converter key mapping numerically, closing the same gap the
VAE/T5 oracles close (test_vae_torch_oracle.py, test_t5_torch_oracle.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hyvideo_prfl_tpu.models import clip as cm  # noqa: E402
from hyvideo_prfl_tpu.utils import convert_encoders as ce  # noqa: E402


def _w(state, key):
    return torch.from_numpy(np.ascontiguousarray(state[key])).double()


def _ln(x, state, pfx, eps):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), _w(state, pfx + ".weight"),
        _w(state, pfx + ".bias"), eps)


def _oracle_clip(state, cfg, images):
    """images [B, H, W, 3] CLIP-normalized -> penultimate tokens."""
    x = torch.from_numpy(np.array(images)).double().permute(0, 3, 1, 2)
    d, n = cfg.dim, cfg.num_heads
    hd = d // n
    x = torch.nn.functional.conv2d(
        x, _w(state, "visual.patch_embedding.weight"),
        stride=cfg.patch_size)  # pre_norm => no bias (clip.py:249-254)
    b = x.shape[0]
    x = x.flatten(2).permute(0, 2, 1)  # [B, gh*gw, D]
    cls = _w(state, "visual.cls_embedding").expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1) + _w(state, "visual.pos_embedding")
    x = _ln(x, state, "visual.pre_norm", cfg.norm_eps)
    penult = None
    for i in range(cfg.num_layers):
        p = f"visual.transformer.{i}."
        l = x.shape[1]
        h = _ln(x, state, p + "norm1", cfg.norm_eps)
        qkv = h @ _w(state, p + "attn.to_qkv.weight").T + \
            _w(state, p + "attn.to_qkv.bias")
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(b, l, n, hd)
        k = k.view(b, l, n, hd)
        v = v.view(b, l, n, hd)
        logits = torch.einsum("bqnd,bknd->bnqk", q, k) / (hd ** 0.5)
        o = torch.einsum("bnqk,bknd->bqnd", logits.softmax(-1), v)
        o = o.reshape(b, l, d) @ _w(state, p + "attn.proj.weight").T + \
            _w(state, p + "attn.proj.bias")
        x = x + o
        h = _ln(x, state, p + "norm2", cfg.norm_eps)
        h = h @ _w(state, p + "mlp.0.weight").T + _w(state, p + "mlp.0.bias")
        h = torch.nn.functional.gelu(h)  # exact gelu (reference 'gelu')
        h = h @ _w(state, p + "mlp.2.weight").T + _w(state, p + "mlp.2.bias")
        x = x + h
        if i == cfg.num_layers - 2:
            penult = x.clone()
    return penult.numpy()


def test_clip_vision_matches_torch_oracle():
    cfg = cm.tiny_clip()
    params = cm.init_clip_params(cfg, jax.random.PRNGKey(5))
    state = ce.clip_flax_to_torch(jax.device_get(params), cfg)
    images = np.asarray(jax.random.normal(
        jax.random.PRNGKey(6), (2, cfg.image_size, cfg.image_size, 3),
        jnp.float32))
    ours = np.asarray(cm.CLIPVisionTower(cfg).apply(
        params, jnp.asarray(images), use_31_block=True))
    oracle = _oracle_clip(state, cfg, images)
    assert ours.shape == oracle.shape  # [2, 1+num_patches, dim]
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)
