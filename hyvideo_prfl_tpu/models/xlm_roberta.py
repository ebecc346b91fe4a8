"""XLM-RoBERTa text tower (the CLIP text encoder side).

Parity target: reference `wan/modules/xlm_roberta.py:1-170` — post-norm
transformer, token + type + position embeddings with RoBERTa-style position
ids (pad_id + cumsum(mask) * mask), padding-masked attention, mean-pooled
head in CLIP's XLMRobertaWithHead (clip.py:304-334). Unused at i2v runtime
(only the vision tower conditions generation) but part of the CLIP
checkpoint surface.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class XLMRobertaConfig:
    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5
    compute_dtype: Any = jnp.float32


def xlm_roberta_large(**kw):
    return XLMRobertaConfig(**kw)


def tiny_xlmr(**kw):
    kw.setdefault("vocab_size", 100)
    kw.setdefault("dim", 32)
    kw.setdefault("num_heads", 2)
    kw.setdefault("num_layers", 2)
    kw.setdefault("max_seq_len", 16)
    return XLMRobertaConfig(**kw)


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


class _Block(nn.Module):
    cfg: XLMRobertaConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        b, l, c = x.shape
        n = cfg.num_heads
        hd = c // n
        q = nn.Dense(c, name="q")(x).reshape(b, l, n, hd)
        k = nn.Dense(c, name="k")(x).reshape(b, l, n, hd)
        v = nn.Dense(c, name="v")(x).reshape(b, l, n, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        logits = jnp.where(mask[:, None, None, :] > 0, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, l, c)
        o = nn.Dense(c, name="o")(o)
        s1 = self.param("norm1_scale", nn.initializers.ones, (c,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (c,))
        s2 = self.param("norm2_scale", nn.initializers.ones, (c,))
        b2 = self.param("norm2_bias", nn.initializers.zeros, (c,))
        if cfg.post_norm:
            x = _ln(x + o, s1, b1, cfg.eps)
            h = nn.Dense(c * 4, name="ffn_0")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(c, name="ffn_2")(h)
            x = _ln(x + h, s2, b2, cfg.eps)
        else:
            x = x + nn.Dense(c, name="o2")(o)  # pragma: no cover
        return x


class XLMRoberta(nn.Module):
    """ids [B, L] -> embeddings [B, L, dim]."""

    cfg: XLMRobertaConfig

    @nn.compact
    def __call__(self, ids):
        cfg = self.cfg
        mask = (ids != cfg.pad_id).astype(jnp.int32)
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.dim))
        typ = self.param("type_embedding", nn.initializers.normal(0.02),
                         (cfg.type_size, cfg.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (cfg.max_seq_len, cfg.dim))
        pos_ids = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
        x = tok[ids] + typ[jnp.zeros_like(ids)] + pos[pos_ids]
        if cfg.post_norm:
            s = self.param("norm_scale", nn.initializers.ones, (cfg.dim,))
            b = self.param("norm_bias", nn.initializers.zeros, (cfg.dim,))
            x = _ln(x, s, b, cfg.eps)

        def body(block, carry, _):
            return block(carry, mask), None

        scan = nn.scan(body, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=cfg.num_layers)
        x, _ = scan(_Block(cfg, name="blocks"), x, None)
        return x


def mean_pool(x, ids, pad_id=1):
    """Masked mean pooling (XLMRobertaWithHead, clip.py:320-330)."""
    mask = (ids != pad_id).astype(jnp.float32)[..., None]
    return (x * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)


def encode_with_head(tree, cfg: XLMRobertaConfig, ids):
    """XLMRobertaWithHead.forward (clip.py:304-327): tower -> masked mean
    pool -> biasless Linear/GELU/Linear projection head. `tree` is the
    full textual tree from utils.convert_encoders.xlmr_torch_to_flax
    ({"params": ..., "head": {"h0", "h2"}})."""
    x = XLMRoberta(cfg).apply({"params": tree["params"]}, ids)
    pooled = mean_pool(x, ids, cfg.pad_id)
    h = pooled @ jnp.asarray(tree["head"]["h0"])
    h = jax.nn.gelu(h, approximate=False)
    return h @ jnp.asarray(tree["head"]["h2"])
