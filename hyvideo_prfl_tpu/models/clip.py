"""CLIP (XLM-R ViT-H/14) vision tower for i2v conditioning.

Parity target: reference `wan/modules/clip.py` — VisionTransformer
(:210-301) with ViT-H/14 config (clip_xlm_roberta_vit_h_14, :472-500):
image 224, patch 14, dim 1280, 16 heads, 32 layers, mlp_ratio 4, gelu,
token pooling, pre-norm. The i2v pipeline uses `use_31_block=True`
(penultimate output, 257 tokens x 1280) as image conditioning
(clip.py:528-541, wan/image2video.py:287-290).

Image preprocessing (visual(), clip.py:528-539): bicubic resize to 224,
[-1,1] -> [0,1] -> CLIP mean/std normalize. Host-side helper provided.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: float = 4.0
    num_heads: int = 16
    num_layers: int = 32
    norm_eps: float = 1e-5
    compute_dtype: Any = jnp.float32

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


def vit_h_14(**kw):
    return CLIPVisionConfig(**kw)


def tiny_clip(**kw):
    kw.setdefault("image_size", 28)
    kw.setdefault("patch_size", 14)
    kw.setdefault("dim", 64)
    kw.setdefault("num_heads", 4)
    kw.setdefault("num_layers", 3)
    return CLIPVisionConfig(**kw)


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


class ViTBlock(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        cd = cfg.compute_dtype
        d = cfg.dim
        n = cfg.num_heads
        hd = d // n
        b, l, _ = x.shape
        s1 = self.param("norm1_scale", nn.initializers.ones, (d,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (d,))
        h = _ln(x, s1, b1, cfg.norm_eps)
        qkv = nn.Dense(d * 3, dtype=cd, param_dtype=jnp.float32,
                       name="to_qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, l, 3, n, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                       preferred_element_type=jnp.float32)
        o = o.astype(cd).reshape(b, l, d)
        o = nn.Dense(d, dtype=cd, param_dtype=jnp.float32, name="proj")(o)
        x = x + o
        s2 = self.param("norm2_scale", nn.initializers.ones, (d,))
        b2 = self.param("norm2_bias", nn.initializers.zeros, (d,))
        h = _ln(x, s2, b2, cfg.norm_eps)
        h = nn.Dense(int(d * cfg.mlp_ratio), dtype=cd,
                     param_dtype=jnp.float32, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=cd, param_dtype=jnp.float32, name="mlp_fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """images [B, H, W, 3] (CLIP-normalized) -> penultimate tokens
    [B, 1+num_patches, dim] (use_31_block semantics)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images, use_31_block: bool = True):
        cfg = self.cfg
        cd = cfg.compute_dtype
        b = images.shape[0]
        p = cfg.patch_size
        gh = cfg.image_size // p
        # pre_norm=True => patch conv has no bias (clip.py:249-254)
        x = nn.Conv(cfg.dim, (p, p), strides=(p, p), use_bias=False,
                    dtype=cd, param_dtype=jnp.float32,
                    name="patch_embedding")(images.astype(cd))
        x = x.reshape(b, gh * gh, cfg.dim)
        cls = self.param(
            "cls_embedding", nn.initializers.normal(cfg.dim ** -0.5),
            (1, 1, cfg.dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.dim)), x], 1)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(cfg.dim ** -0.5),
            (1, cfg.num_patches + 1, cfg.dim),
        )
        x = x + pos
        ps = self.param("pre_norm_scale", nn.initializers.ones, (cfg.dim,))
        pb = self.param("pre_norm_bias", nn.initializers.zeros, (cfg.dim,))
        x = _ln(x, ps, pb, cfg.norm_eps)

        # always scan all layers (params cover the full stack); capture the
        # penultimate activation for use_31_block semantics (clip.py:296-298)
        def body(block, carry, _):
            x, penult, idx = carry
            x_new = block(x)
            penult = jnp.where(idx == cfg.num_layers - 2, x_new, penult)
            return (x_new, penult, idx + 1), None

        scan = nn.scan(
            body, variable_axes={"params": 0}, split_rngs={"params": True},
            length=cfg.num_layers,
        )
        (x_full, x_penult, _), _ = scan(
            ViTBlock(cfg, name="blocks"), (x, x, jnp.int32(0)), None
        )
        out = x_penult if use_31_block else x_full
        return out.astype(jnp.float32)


def preprocess_frames(frames_m1_1: np.ndarray, image_size: int = 224):
    """[B, H, W, 3] in [-1, 1] -> CLIP-normalized [B, S, S, 3] (host side,
    bicubic resize like clip.py:528-539)."""
    import cv2

    out = []
    for f in frames_m1_1:
        img = (f.astype(np.float32) + 1.0) / 2.0
        img = cv2.resize(img, (image_size, image_size),
                         interpolation=cv2.INTER_CUBIC)
        out.append((img - CLIP_MEAN) / CLIP_STD)
    return np.stack(out)


def init_clip_params(cfg: CLIPVisionConfig, rng):
    model = CLIPVisionTower(cfg)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    return model.init(rng, x)
