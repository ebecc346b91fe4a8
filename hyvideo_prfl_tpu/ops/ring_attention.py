"""Ring attention over the sp mesh axis (the "ring" half of USP).

Parity target: the reference's xfuser/yunchang hybrid long-context attention
(`wan/distributed/xdit_context_parallel.py:190-233`,
`inference_prfl.py:71-82`: ring_degree x ulysses_degree must equal the world
size). Ulysses (ops/attention.ulysses_attention) covers head-sharded
parallelism up to num_heads devices; ring attention removes that ceiling by
keeping queries local and ROTATING key/value blocks around the ring with an
online-softmax merge — sequence length per device stays L/ring and no
device ever holds the full K/V.

TPU-native form: `shard_map` over the sp axis; each ring step computes a
per-block attention (Pallas flash on TPU, with the block's logsumexp) and
merges via the standard (m, l, acc) update; `jax.lax.ppermute` rotates K/V
blocks over ICI. Inference-path component (the reference uses USP only at
inference); the merge math is differentiable but the recommended training
path remains Ulysses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _block_attention_with_lse(q, k, v):
    """Per-block attention returning (out fp32, lse fp32 [B, Lq, N]).

    Uses the Pallas flash kernel's saved logsumexp on TPU; a fused XLA
    softmax path elsewhere.
    """
    import jax

    d = q.shape[-1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and d % 128 == 0:
        from . import flash_attention as fa

        b, lq, n, _ = q.shape
        lk = k.shape[1]
        block_q = min(fa.DEFAULT_BLOCK_Q, fa._pad_len(lq, 128))
        block_k = min(fa.DEFAULT_BLOCK_K, fa._pad_len(lk, 128))
        lq_p = fa._pad_len(lq, block_q)
        lk_p = fa._pad_len(lk, block_k)

        def bnld(x, lp):
            x = jnp.moveaxis(x, 2, 1).reshape(b * n, x.shape[1], d)
            if lp != x.shape[1]:
                x = jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))
            return x

        valid = jnp.full((b * n,), lk, jnp.int32)
        o, lse = fa._flash_fwd_impl(
            bnld(q, lq_p), bnld(k, lk_p), bnld(v, lk_p), valid,
            block_q, block_k, masked=(lk_p != lk),
        )
        o = jnp.moveaxis(o[:, :lq].reshape(b, n, lq, d), 1, 2)
        lse = lse[:, :lq, 0].reshape(b, n, lq).transpose(0, 2, 1)
        return o.astype(jnp.float32), lse

    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(d, jnp.float32))
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bnqk,bknd->bqnd", (p / l).astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    lse = (m + jnp.log(l))[:, :, :, 0].transpose(0, 2, 1)  # [B, Lq, N]
    return o.astype(jnp.float32), lse


def _ring_inner(q, k, v, ring_axis: str):
    """Per-device ring attention body (call inside shard_map): queries stay
    local, K/V blocks rotate around `ring_axis` via ppermute with an
    online-softmax merge."""
    n_ring = jax.lax.axis_size(ring_axis)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    o0, lse0 = _block_attention_with_lse(q, k, v)

    def body(carry, _):
        k_blk, v_blk, o_acc, lse_acc = carry
        # rotate K/V to the next device over ICI
        k_blk = jax.lax.ppermute(k_blk, ring_axis, perm)
        v_blk = jax.lax.ppermute(v_blk, ring_axis, perm)
        o_blk, lse_blk = _block_attention_with_lse(q, k_blk, v_blk)
        # online-softmax merge of two normalized partials
        m = jnp.maximum(lse_acc, lse_blk)
        w_acc = jnp.exp(lse_acc - m)[..., None]  # [B, Lq, N, 1]
        w_blk = jnp.exp(lse_blk - m)[..., None]
        denom = w_acc + w_blk
        o_acc = (o_acc * w_acc + o_blk * w_blk) / denom
        lse_acc = m + jnp.log(denom[..., 0])
        return (k_blk, v_blk, o_acc, lse_acc), None

    (k_f, v_f, o, lse), _ = jax.lax.scan(
        body, (k, v, o0, lse0), None, length=n_ring - 1
    )
    return o.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sp_axis: str = "sp",
    data_axis: str = "data",
):
    """Full attention with K/V rotated around the sp ring.

    q, k, v: [B, L, N, D] sharded P(data, sp, None, None) under an active
    mesh. Returns the same sharding. Per device, memory is O(L/ring).
    """
    mesh = jax.sharding.get_abstract_mesh()
    spec = P(data_axis, sp_axis, None, None)

    def inner(q, k, v):
        return _ring_inner(q, k, v, sp_axis)

    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def usp_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    ring_axis: str = "ring",
    ulysses_axis: str = "sp",
    data_axis: str = "data",
):
    """USP = ring x Ulysses hybrid attention (xfuser's
    `initialize_model_parallel(ring_degree, ulysses_degree)` topology,
    inference_prfl.py:71-82 + xdit_context_parallel.py:190-233).

    Tokens arrive sharded over BOTH axes (P(data, (ring, sp))). Inside the
    shard_map: an all_to_all over the ulysses axis scatters heads / gathers
    the ring-local sequence, ring attention rotates K/V blocks over the ring
    axis, and the inverse all_to_all restores token sharding. Head count
    must be divisible by the ulysses degree; sequence by ring x ulysses.
    """
    mesh = jax.sharding.get_abstract_mesh()
    spec = P(data_axis, (ring_axis, ulysses_axis), None, None)

    def inner(q, k, v):
        def a2a_heads(x):  # [B, L/(r*u), N, D] -> [B, L/r, N/u, D]
            return jax.lax.all_to_all(
                x, ulysses_axis, split_axis=2, concat_axis=1, tiled=True)

        qh, kh, vh = a2a_heads(q), a2a_heads(k), a2a_heads(v)
        o = _ring_inner(qh, kh, vh, ring_axis)
        return jax.lax.all_to_all(
            o, ulysses_axis, split_axis=1, concat_axis=2, tiled=True)

    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
