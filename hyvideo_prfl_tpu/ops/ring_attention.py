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
blocks over ICI.

Training-grade: a custom VJP implements the ring BACKWARD pass (the ring
attention recipe): queries and dQ stay local; K/V blocks re-rotate around
the ring with per-block flash backward against the saved GLOBAL logsumexp,
and the accumulated dK/dV partials ride the rotation home. Memory stays
O(L/ring) per device in both passes — autodiff through the forward scan
would instead checkpoint every merge step (O(L) per device), defeating the
point of the ring. The reference only uses ring attention at inference
(xfuser USP); the backward is this framework's extension so USP also covers
training when sequence length exceeds the Ulysses head ceiling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _block_attention_with_lse(q, k, v, bounded=False):
    """Per-block attention returning (out fp32, lse fp32 [B, Lq, N]).

    Uses the Pallas flash kernel's saved logsumexp on TPU; a fused XLA
    softmax path elsewhere.
    """
    d = q.shape[-1]
    from . import flash_attention as fa

    # PALLAS_INTERPRET-aware (not backend sniffing): chipless AOT audits
    # compile from a CPU process with PALLAS_INTERPRET=0 and MUST take the
    # Mosaic path — the XLA branch materializes [B,N,L,L] scores (114 GB at
    # the 14B USP serving scale)
    if not fa._interpret() and d % 128 == 0:

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
        mode = fa._pad_mode() if lk_p != lk else None
        if bounded:
            mode = fa._encode_bounded(mode)
        o, lse = fa._flash_fwd_impl(
            bnld(q, lq_p), bnld(k, lk_p), bnld(v, lk_p), valid,
            block_q, block_k, mode, lk,
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


def _block_bwd(q, k, v, o, lse, do):
    """Gradients of one (q block, k/v block) pair against the GLOBAL
    logsumexp: p = exp(qk^T/sqrt(d) - lse) are the *globally normalized*
    probabilities, so summing these partials over all k/v blocks yields
    exactly the full-attention gradients. Shapes [B, L, N, D]; lse
    [B, Lq, N] fp32. Returns (dq_partial, dk_blk, dv_blk)."""
    d = q.shape[-1]
    from . import flash_attention as fa

    if not fa._interpret() and d % 128 == 0:

        b, lq, n, _ = q.shape
        lk = k.shape[1]
        block_q = min(fa.DEFAULT_BLOCK_Q, fa._pad_len(lq, 128))
        block_k = min(fa.DEFAULT_BLOCK_K, fa._pad_len(lk, 128))
        lq_p = fa._pad_len(lq, block_q)
        lk_p = fa._pad_len(lk, block_k)

        def bnld(x, lp, fill=0.0):
            x = jnp.moveaxis(x, 2, 1).reshape(b * n, x.shape[1], d)
            if lp != x.shape[1]:
                x = jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)),
                            constant_values=fill)
            return x

        # padded q rows: o/do pad to 0 => delta 0 and dv/dk contributions 0;
        # lse pads large-positive so p underflows to 0 (no overflow).
        # residual lse contract is [BN, Lq, 1] (flash_attention._flash_fwd)
        lse_p = lse.transpose(0, 2, 1).reshape(b * n, lq)[:, :, None]
        if lq_p != lq:
            lse_p = jnp.pad(lse_p, ((0, 0), (0, lq_p - lq), (0, 0)),
                            constant_values=1e9)
        valid = jnp.full((b * n,), lk, jnp.int32)
        res = (bnld(q, lq_p), bnld(k, lk_p), bnld(v, lk_p), valid,
               bnld(o, lq_p), lse_p)
        dq, dk, dv, _ = fa._flash_bwd(
            block_q, block_k, fa._pad_mode() if lk_p != lk else None, lk, res,
            bnld(do, lq_p)
        )

        def undo(x, l):
            return jnp.moveaxis(x[:, :l].reshape(b, n, l, d), 1, 2)

        return undo(dq, lq), undo(dk, lk), undo(dv, lk)

    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    s = jnp.einsum("bqnd,bknd->bnqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse.transpose(0, 2, 1)[..., None])  # [B, N, Lq, Lk]
    do32 = do.astype(jnp.float32)
    delta = jnp.sum(do32 * o.astype(jnp.float32), axis=-1)  # [B, Lq, N]
    dv = jnp.einsum("bnqk,bqnd->bknd", p, do32)
    dp = jnp.einsum("bqnd,bknd->bnqk", do32, v.astype(jnp.float32))
    ds = p * (dp - delta.transpose(0, 2, 1)[..., None]) * scale
    dq = jnp.einsum("bnqk,bknd->bqnd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bnqk,bqnd->bknd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _ring_fwd_inner(q, k, v, ring_axis: str, bounded: bool = False):
    """Per-device ring attention body (call inside shard_map): queries stay
    local, K/V blocks rotate around `ring_axis` via ppermute with an
    online-softmax merge. Returns (o [B, Lq, N, D] in q.dtype, global
    lse [B, Lq, N] fp32)."""
    n_ring = jax.lax.axis_size(ring_axis)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    o0, lse0 = _block_attention_with_lse(q, k, v, bounded)

    def body(carry, _):
        k_blk, v_blk, o_acc, lse_acc = carry
        # rotate K/V to the next device over ICI
        k_blk = jax.lax.ppermute(k_blk, ring_axis, perm)
        v_blk = jax.lax.ppermute(v_blk, ring_axis, perm)
        o_blk, lse_blk = _block_attention_with_lse(q, k_blk, v_blk,
                                                   bounded)
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
    return o.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ring_inner(q, k, v, ring_axis: str, bounded: bool = False):
    o, _ = _ring_fwd_inner(q, k, v, ring_axis, bounded)
    return o


def _ring_inner_fwd(q, k, v, ring_axis: str, bounded: bool = False):
    o, lse = _ring_fwd_inner(q, k, v, ring_axis, bounded)
    return o, (q, k, v, o, lse)


def _ring_inner_bwd(ring_axis, bounded, res, do):
    """Ring backward: K/V blocks re-rotate; dK/dV partials accumulate while
    riding the SAME rotation, so after the full circle each block's gradient
    arrives back at its home device. dQ accumulates locally."""
    q, k, v, o, lse = res
    n_ring = jax.lax.axis_size(ring_axis)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    dq, dk, dv = [g.astype(jnp.float32)
                  for g in _block_bwd(q, k, v, o, lse, do)]

    def body(carry, _):
        k_blk, v_blk, dk_blk, dv_blk, dq_acc = carry
        k_blk = jax.lax.ppermute(k_blk, ring_axis, perm)
        v_blk = jax.lax.ppermute(v_blk, ring_axis, perm)
        dk_blk = jax.lax.ppermute(dk_blk, ring_axis, perm)
        dv_blk = jax.lax.ppermute(dv_blk, ring_axis, perm)
        dq_b, dk_b, dv_b = _block_bwd(q, k_blk, v_blk, o, lse, do)
        return (k_blk, v_blk, dk_blk + dk_b, dv_blk + dv_b,
                dq_acc + dq_b), None

    (k_f, v_f, dk, dv, dq), _ = jax.lax.scan(
        body, (k, v, dk, dv, dq), None, length=n_ring - 1
    )
    # one final rotation returns each accumulated dK/dV block home
    dk = jax.lax.ppermute(dk, ring_axis, perm)
    dv = jax.lax.ppermute(dv, ring_axis, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_inner.defvjp(_ring_inner_fwd, _ring_inner_bwd)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sp_axis: str = "sp",
    data_axis: str = "data",
    bounded_logits: bool = False,
):
    """Full attention with K/V rotated around the sp ring.

    q, k, v: [B, L, N, D] sharded P(data, sp, None, None) under an active
    mesh. Returns the same sharding. Per device, memory is O(L/ring).
    """
    mesh = jax.sharding.get_abstract_mesh()
    spec = P(data_axis, sp_axis, None, None)

    def inner(q, k, v):
        return _ring_inner(q, k, v, sp_axis, bool(bounded_logits))

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
    bounded_logits: bool = False,
    qk_int8: bool = False,
):
    """USP = ring x Ulysses hybrid attention (xfuser's
    `initialize_model_parallel(ring_degree, ulysses_degree)` topology,
    inference_prfl.py:71-82 + xdit_context_parallel.py:190-233).

    Tokens arrive sharded over BOTH axes (P(data, (ring, sp))). Inside the
    shard_map: an all_to_all over the ulysses axis scatters heads / gathers
    the ring-local sequence, ring attention rotates K/V blocks over the ring
    axis, and the inverse all_to_all restores token sharding. Head count
    must be divisible by the ulysses degree; sequence by ring x ulysses.

    HYV_ULYSSES_CHUNKS > 1 splits the sandwich over head groups (identical
    numerics) so per-chunk a2a can overlap the previous chunk's ring pass
    under async-a2a lowering (ops/attention.ulysses_chunks).

    qk_int8 engages the int8 qk^T serving forward when the ring degree is
    1 (pure Ulysses — the bounded kernel with no ring merges); ring > 1
    keeps bf16 (the per-hop online-softmax merge path).
    """
    from . import flash_attention as fa
    from .attention import ulysses_chunks

    mesh = jax.sharding.get_abstract_mesh()
    spec = P(data_axis, (ring_axis, ulysses_axis), None, None)
    u = mesh.shape.get(ulysses_axis, 1)
    ring_n = mesh.shape.get(ring_axis, 1)
    chunks = ulysses_chunks(q.shape[2], u)

    def one_chunk(q, k, v):
        def a2a_heads(x):  # [B, L/(r*u), Nc, D] -> [B, L/r, Nc/u, D]
            return jax.lax.all_to_all(
                x, ulysses_axis, split_axis=2, concat_axis=1, tiled=True)

        qh, kh, vh = a2a_heads(q), a2a_heads(k), a2a_heads(v)
        # dispatch guard: the in-tree kernel requires 128-multiple head
        # dims (flash_attention's own assert); shapes outside that regime
        # fall through to the regular path instead of crashing the
        # shard_map body
        if qk_int8 and ring_n == 1 and q.shape[-1] % 128 == 0:
            o = fa.flash_attention(qh, kh, vh,
                                   bounded_logits=bool(bounded_logits),
                                   qk_int8=True)
        else:
            o = _ring_inner(qh, kh, vh, ring_axis, bool(bounded_logits))
        return jax.lax.all_to_all(
            o, ulysses_axis, split_axis=1, concat_axis=2, tiled=True)

    def inner(q, k, v):
        if chunks == 1:
            return one_chunk(q, k, v)
        nc = q.shape[2] // chunks
        outs = [one_chunk(q[:, :, i * nc:(i + 1) * nc],
                          k[:, :, i * nc:(i + 1) * nc],
                          v[:, :, i * nc:(i + 1) * nc])
                for i in range(chunks)]
        return jnp.concatenate(outs, axis=2)

    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
