"""umT5-XXL text encoder, TPU-native flax implementation.

Parity target: reference `wan/modules/t5.py` (T5Encoder / umt5_xxl,
:456-469): vocab 256384, dim 4096, ffn 10240, 64 heads, 24 layers,
per-layer relative position embeddings (shared_pos=False), GEGLU feed
forward (fc1(x) * gelu(gate(x)), no biases), T5 RMS layer-norm, NO
attention scaling (t5.py:112), fp32 softmax.

TPU notes: the encoder is frozen (preprocessing/inference only); runs in
bf16 with fp32 norms/softmax; relative position buckets are computed
host-side once per sequence length (static shapes).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False
    compute_dtype: Any = jnp.bfloat16


def umt5_xxl(**kw):
    return T5Config(**kw)


def tiny_t5(**kw):
    kw.setdefault("vocab_size", 1000)
    kw.setdefault("dim", 64)
    kw.setdefault("dim_attn", 64)
    kw.setdefault("dim_ffn", 128)
    kw.setdefault("num_heads", 4)
    kw.setdefault("num_layers", 2)
    return T5Config(**kw)


@functools.lru_cache(maxsize=16)
def _relative_buckets_np(lq: int, lk: int, num_buckets: int,
                         max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 relative position buckets (t5.py:246-265)."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        rel_large = max_exact + (
            np.log(np.maximum(rel_pos, 1) / max_exact)
            / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, rel_large)
    return rel_buckets.astype(np.int32)


def _t5_norm(x, weight, eps=1e-6):
    """T5 RMS norm: x * rsqrt(mean(x^2)) * w, fp32 stats (t5.py:53-66)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


class T5SelfAttention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, mask, pos_bias):
        cfg = self.cfg
        cd = cfg.compute_dtype
        b, l, _ = x.shape
        n = cfg.num_heads
        hd = cfg.dim_attn // n
        dense = functools.partial(
            nn.Dense, use_bias=False, dtype=cd, param_dtype=jnp.float32
        )
        q = dense(cfg.dim_attn, name="q")(x).reshape(b, l, n, hd)
        k = dense(cfg.dim_attn, name="k")(x).reshape(b, l, n, hd)
        v = dense(cfg.dim_attn, name="v")(x).reshape(b, l, n, hd)
        # NO scaling (T5 convention, t5.py:112)
        logits = jnp.einsum("binc,bjnc->bnij", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + pos_bias
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :] > 0, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnij,bjnc->binc", probs, v,
                       preferred_element_type=jnp.float32).astype(cd)
        return dense(cfg.dim, name="o")(o.reshape(b, l, cfg.dim_attn))


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, mask, shared_bias):
        cfg = self.cfg
        if cfg.shared_pos:
            bias = shared_bias
        else:
            emb = self.param(
                "rel_embedding",
                nn.initializers.normal(
                    (2 * cfg.num_buckets * cfg.num_heads) ** -0.5),
                (cfg.num_buckets, cfg.num_heads),
            )
            buckets = jnp.asarray(
                _relative_buckets_np(x.shape[1], x.shape[1], cfg.num_buckets))
            bias = jnp.transpose(emb[buckets], (2, 0, 1))[None]  # [1,N,L,L]
        n1 = self.param("norm1", nn.initializers.ones, (cfg.dim,))
        h = T5SelfAttention(cfg, name="attn")(_t5_norm(x, n1), mask,
                                              bias.astype(jnp.float32))
        x = x + h.astype(x.dtype)
        n2 = self.param("norm2", nn.initializers.ones, (cfg.dim,))
        hn = _t5_norm(x, n2).astype(cfg.compute_dtype)
        dense = functools.partial(
            nn.Dense, use_bias=False, dtype=cfg.compute_dtype,
            param_dtype=jnp.float32,
        )
        gate = nn.gelu(dense(cfg.dim_ffn, name="gate")(hn), approximate=True)
        ff = dense(cfg.dim_ffn, name="fc1")(hn) * gate
        ff = dense(cfg.dim, name="fc2")(ff)
        return x + ff.astype(x.dtype)


class T5Encoder(nn.Module):
    """Token ids [B, L] + mask [B, L] -> embeddings [B, L, dim] fp32."""

    cfg: T5Config

    @nn.compact
    def __call__(self, ids, mask=None):
        cfg = self.cfg
        emb = self.param(
            "token_embedding", nn.initializers.normal(1.0),
            (cfg.vocab_size, cfg.dim),
        )
        x = emb[ids].astype(cfg.compute_dtype)
        shared_bias = None
        if cfg.shared_pos:
            semb = self.param(
                "shared_rel_embedding",
                nn.initializers.normal(
                    (2 * cfg.num_buckets * cfg.num_heads) ** -0.5),
                (cfg.num_buckets, cfg.num_heads),
            )
            buckets = jnp.asarray(
                _relative_buckets_np(ids.shape[1], ids.shape[1],
                                     cfg.num_buckets))
            shared_bias = jnp.transpose(semb[buckets], (2, 0, 1))[None]

        def body(block, carry, _):
            return block(carry, mask, shared_bias), None

        scan = nn.scan(
            body, variable_axes={"params": 0}, split_rngs={"params": True},
            length=cfg.num_layers,
        )
        x, _ = scan(T5Block(cfg, name="blocks"), x, None)
        nf = self.param("norm", nn.initializers.ones, (cfg.dim,))
        return _t5_norm(x, nf).astype(jnp.float32)


def encode_text(params, cfg: T5Config, ids, mask):
    """Reference __call__ semantics (t5.py:506-513): full padded context;
    callers slice by mask lengths if they need trimmed embeddings."""
    return T5Encoder(cfg).apply(params, ids, mask)
