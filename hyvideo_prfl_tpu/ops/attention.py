"""Attention dispatch for the video DiT.

Replaces the reference's flash-attn CUDA wrapper
(`wan/modules/attention.py:24-130`, flash_attn_varlen_func). TPU-native
strategy: fixed-shape padded sequences + key-validity masks instead of
varlen cu_seqlens (the Wan model pads to a fixed seq_len anyway,
model.py:584-587).

Two backends:
* "xla": einsum softmax attention with fp32 accumulation — always available,
  the correctness baseline; XLA fuses it reasonably well.
* "flash": Pallas TPU flash-attention kernel (ops/flash_attention.py),
  O(L) memory, used for the long-video hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = "xla"


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    assert name in ("xla", "flash")
    _DEFAULT_BACKEND = name


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_valid_len: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Multi-head attention over [B, L, N, D] tensors (BLND layout).

    k_valid_len: optional [B] int32; keys at positions >= k_valid_len[b] are
    masked out (the reference's k_lens semantics, attention.py:60-66).
    Returns [B, Lq, N, D] in q.dtype.
    """
    backend = backend or _DEFAULT_BACKEND
    if backend == "flash":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, k_valid_len=k_valid_len)
    return _xla_attention(q, k, v, k_valid_len)


def _xla_attention(q, k, v, k_valid_len):
    orig_dtype = q.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    # [B, N, Lq, Lk] logits with fp32 accumulation on the MXU
    logits = jnp.einsum(
        "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if k_valid_len is not None:
        lk = k.shape[1]
        key_ids = jnp.arange(lk, dtype=jnp.int32)
        mask = key_ids[None, :] < k_valid_len[:, None]  # [B, Lk]
        logits = jnp.where(mask[:, None, None, :], logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bnqk,bknd->bqnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
