"""GSPMD/Shardy-partitionable flash attention.

The SPMD partitioner cannot see inside an opaque `pallas_call`, so the plain
kernel (ops/flash_attention.py) cannot run in a pjit'd multi-chip program —
the round-1 auto backend fell back to XLA einsum attention there, which
materializes [L, L] logits (~23 GB/head-batch at the 75.6k-token target).

This module wraps the kernel's forward and backward passes in
`jax.experimental.custom_partitioning` with a batch/head partition rule:
each device runs the per-device Pallas kernel on its local
[B/data, L, N/sp, D] shard. With the DiT's `attn_heads` sharding constraint
(parallel/sharding.py) the partitioner moves the sequence sharding to a
head sharding around the op — exactly the Ulysses all_to_all sandwich of
the reference (communication.py:40-160 + model.py:183-196), but inserted by
the compiler.

Reference behavior matched: flash attention in every self-attention
(`/root/reference/diffusers_lite/wan/modules/attention.py:24-130`).

Layouts at this boundary: q [B, Lq, N, D], k/v [B, Lk, N, D], valid [B],
out [B, Lq, N, D], lse [B, N, Lq, 128]. Sequence (l, s), head_dim (d) and
the lse lane dim (r) are declared need-replication; batch (b) and heads (n)
partition freely.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from . import flash_attention as fa
from .flash_attention import _flash_bwd, _flash_fwd_impl, _pad_len, \
    pick_blocks as _blocks


def _to_bnld(x, lp):
    b, l, n, d = x.shape
    x = jnp.moveaxis(x, 2, 1).reshape(b * n, l, d)
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    return x


def _fwd_local(q, k, v, valid, masked=True, bounded=False, qk_int8=False):
    """Per-shard forward: BLND in, (o BLND, lse [B,N,Lq,128]) out."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    block_q, block_k = _blocks(lq, lk)
    lq_p, lk_p = _pad_len(lq, block_q), _pad_len(lk, block_k)
    qb, kb, vb = _to_bnld(q, lq_p), _to_bnld(k, lk_p), _to_bnld(v, lk_p)
    validr = jnp.repeat(valid.astype(jnp.int32), n)
    mode = "user" if masked else (fa._pad_mode() if lk_p != lk else None)
    if (qk_int8 and fa.FLASH_QK8 and bounded and fa.FLASH_BOUNDED
            and not masked and lk_p // block_k > 1):
        # int8 qk^T serving forward (see flash_attention(qk_int8=True))
        o, lse = fa._flash_fwd_qk8(qb, kb, vb, block_q, block_k, lk)
    else:
        if bounded and not masked:
            mode = fa._encode_bounded(mode)
        o, lse = _flash_fwd_impl(qb, kb, vb, validr, block_q, block_k,
                                 mode, lk)
    o = o[:, :lq].reshape(b, n, lq, d)
    return jnp.moveaxis(o, 1, 2), lse[:, :lq].reshape(b, n, lq, 128)


def _bwd_local(q, k, v, valid, o, lse, do, masked=True):
    """Per-shard backward: recompute-from-lse flash backward."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    block_q, block_k = _blocks(lq, lk)
    lq_p, lk_p = _pad_len(lq, block_q), _pad_len(lk, block_k)
    qb, kb, vb = _to_bnld(q, lq_p), _to_bnld(k, lk_p), _to_bnld(v, lk_p)
    ob, dob = _to_bnld(o, lq_p), _to_bnld(do, lq_p)
    # residual lse contract is [BN, Lq, 1] (flash_attention._flash_fwd)
    lseb = lse.reshape(b * n, lq, 128)[:, :, :1]
    if lq_p != lq:  # zero-padded do/o rows make padded-row ds vanish
        lseb = jnp.pad(lseb, ((0, 0), (0, lq_p - lq), (0, 0)))
    validr = jnp.repeat(valid.astype(jnp.int32), n)
    mode = "user" if masked else (fa._pad_mode() if lk_p != lk else None)
    dq, dk, dv, _ = _flash_bwd(
        block_q, block_k, mode, lk, (qb, kb, vb, validr, ob, lseb), dob
    )

    def back(x, l):
        x = x[:, :l].reshape(b, n, l, d)
        return jnp.moveaxis(x, 1, 2)

    return back(dq, lq), back(dk, lk), back(dv, lk)


def _norm_spec(sharding, rank):
    spec = tuple(sharding.spec) if sharding is not None else ()
    return spec + (None,) * (rank - len(spec))


def _fwd_partition(mesh, arg_shapes, result_shape):
    qs = _norm_spec(arg_shapes[0].sharding, 4)
    b_ax, n_ax = qs[0], qs[2]
    qkv = NamedSharding(mesh, P(b_ax, None, n_ax, None))
    vsh = NamedSharding(mesh, P(b_ax))
    out = (
        NamedSharding(mesh, P(b_ax, None, n_ax, None)),
        NamedSharding(mesh, P(b_ax, n_ax, None, None)),
    )
    return mesh, _fwd_local, out, (qkv, qkv, qkv, vsh)


def _fwd_infer(mesh, arg_shapes, result_shape):
    qs = _norm_spec(arg_shapes[0].sharding, 4)
    return (
        NamedSharding(mesh, P(qs[0], None, qs[2], None)),
        NamedSharding(mesh, P(qs[0], qs[2], None, None)),
    )


def _make_fwd_cp(masked, bounded=False, qk_int8=False):
    def fn(q, k, v, valid):
        return _fwd_local(q, k, v, valid, masked, bounded, qk_int8)

    def partition(mesh, arg_shapes, result_shape):
        m, _, out, args = _fwd_partition(mesh, arg_shapes, result_shape)
        return m, fn, out, args

    cp = custom_partitioning(fn)
    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=_fwd_infer,
        sharding_rule="b l n d, b s n d, b s n d, b -> b l n d, b n l r",
        need_replication_factors=("l", "d", "s", "r"),
    )
    return cp


# keyed by (masked, bounded, qk_int8) — the backward never needs bounded
# (it lse-recomputes) nor int8 (serving-only; a grad through it would use
# the bf16 lse-recompute backward on the unquantized q/k), so _BWD_CP
# stays keyed by masked alone
_FWD_CP = {(m, b, i8): _make_fwd_cp(m, b, i8)
           for m in (True, False) for b in (True, False)
           for i8 in (True, False)}


def _bwd_partition(mesh, arg_shapes, result_shape):
    qs = _norm_spec(arg_shapes[0].sharding, 4)
    b_ax, n_ax = qs[0], qs[2]
    qkv = NamedSharding(mesh, P(b_ax, None, n_ax, None))
    vsh = NamedSharding(mesh, P(b_ax))
    lsh = NamedSharding(mesh, P(b_ax, n_ax, None, None))
    return (
        mesh,
        _bwd_local,
        (qkv, qkv, qkv),
        (qkv, qkv, qkv, vsh, qkv, lsh, qkv),
    )


def _bwd_infer(mesh, arg_shapes, result_shape):
    qs = _norm_spec(arg_shapes[0].sharding, 4)
    qkv = NamedSharding(mesh, P(qs[0], None, qs[2], None))
    return (qkv, qkv, qkv)


def _make_bwd_cp(masked):
    def fn(q, k, v, valid, o, lse, do):
        return _bwd_local(q, k, v, valid, o, lse, do, masked)

    def partition(mesh, arg_shapes, result_shape):
        m, _, out, args = _bwd_partition(mesh, arg_shapes, result_shape)
        return m, fn, out, args

    cp = custom_partitioning(fn)
    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=_bwd_infer,
        sharding_rule=(
            "b l n d, b s n d, b s n d, b, b l n d, b n l r, b l n d "
            "-> b l n d, b s n d, b s n d"
        ),
        need_replication_factors=("l", "d", "s", "r"),
    )
    return cp


_BWD_CP = {True: _make_bwd_cp(True), False: _make_bwd_cp(False)}


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _sharded(q, k, v, valid, masked, bounded, qk_int8=False):
    o, _ = _FWD_CP[(masked, bounded, qk_int8)](q, k, v, valid)
    return o


def _sharded_fwd(q, k, v, valid, masked, bounded, qk_int8=False):
    o, lse = _FWD_CP[(masked, bounded, qk_int8)](q, k, v, valid)
    return o, (q, k, v, valid, o, lse)


def _sharded_bwd(masked, bounded, qk_int8, res, do):
    q, k, v, valid, o, lse = res
    dq, dk, dv = _BWD_CP[masked](q, k, v, valid, o, lse, do)
    return dq, dk, dv, None


_sharded.defvjp(_sharded_fwd, _sharded_bwd)


def flash_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_valid_len: Optional[jnp.ndarray] = None,
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Flash attention over [B, L, N, D], partitionable by GSPMD/Shardy over
    (batch, heads). Drop-in for flash_attention in pjit'd multi-chip code."""
    b = q.shape[0]
    valid = (
        jnp.full((b,), k.shape[1], jnp.int32)
        if k_valid_len is None
        else k_valid_len.astype(jnp.int32)
    )
    return _sharded(q, k, v, valid, k_valid_len is not None,
                    bool(bounded_logits), bool(qk_int8))
