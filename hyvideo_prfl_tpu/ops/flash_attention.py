"""Pallas TPU flash attention (forward + backward), the DiT's hot kernel.

Replaces the reference's flash-attn CUDA dependency
(`wan/modules/attention.py:24-130`, flash_attn_varlen_func). Design follows
the standard TPU flash-attention decomposition:

* O(L) memory: the [Lq, Lk] score matrix never materializes in HBM.
* Sequential TPU grid (batch*heads, q_blocks, k_blocks) with the k axis
  innermost; online-softmax state (m, l, acc) lives in VMEM scratch and
  persists across the k steps of one q block. Pallas pipelines the HBM->VMEM
  block streaming automatically.
* Backward = one small XLA precompute (delta = rowsum(dO * O)) + two Pallas
  kernels: dq (k innermost, accumulate into scratch) and dk/dv (q innermost),
  both recomputing the probabilities from the saved per-row logsumexp rather
  than storing P (recompute-over-store, the right trade on HBM bandwidth).
* Padding: fixed-shape sequences; optional `k_valid_len` masks padded keys
  (replacing the varlen cu_seqlens API; Wan pads to a fixed seq_len anyway,
  model.py:584-587).

Layout contract: q, k, v are [B, L, N, D] (BLND); internally reshaped to
[B*N, L, D]. D must be a multiple of 128 (Wan head_dim is exactly 128).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
# measured on v5e (see CLAUDE.md timing protocol): full-K blocks win up to
# ~3.5k keys (48 TF/s @3584, no pad waste); 2048 wins beyond
# (83.7 TF/s @8192, 112 TF/s @18944 = 57% of peak)
DEFAULT_BLOCK_K = 2048
FULL_K_MAX = 3584
NEG_INF = -1e30
# exp2 trick (FA2/splash-style): fold log2(e) into the q scaling so the
# softmax runs on the VPU's native pow2 without the per-element ln2 multiply
# inside exp. lse stays in NATURAL units at the kernel boundary (ring
# attention merges depend on it); backward converts back to log2 space with
# one [BQ, 1] multiply.
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
import os as _os
# A/B switch: exp2 softmax with log2e folded into the q scale vs plain exp
FLASH_EXP2 = _os.environ.get("HYV_FLASH_EXP2", "1") == "1"
# A/B switch: mask-free static padding ("padfree"). K is zero-padded, so a
# padded column's score is exactly 0 and its softmax contribution is
# exp(0 - m) to the denominator only (the matching v row is zero, so the
# accumulator is untouched). The forward skips the ~3 per-tile VPU masking
# passes and subtracts n_pad * exp(-m_final) from l once at finish (exact:
# each pad contribution exp(-m_t) is rescaled by prod(corr) = exp(m_t -
# m_final) across the online-softmax chain). The backward needs NO
# correction at all: p_pad columns multiply zero k rows (dq), zero dp
# contributions (ds = p * (0 - 0) on padded q rows), or write to dk/dv pad
# rows that the caller slices off. Pad columns can pull m up to 0 when all
# real scores are negative, which is harmless (softmax is shift-invariant
# and qk-normed logits are far from the fp32 underflow range).
FLASH_PADFREE = _os.environ.get("HYV_FLASH_PADFREE", "1") == "1"
# A/B switch: single-pass backward. The split dq/dkv kernels execute 7
# matmuls per (q, k) cell (s and dp are computed in both) at ~90% of MXU
# peak — matmul COUNT is the backward's cost. The merged kernel computes
# s/p/dp/ds once and emits all three grads (5 matmuls, the algorithmic
# minimum with lse-recompute). dk/dv accumulate in VMEM scratch over the
# inner q sweep; dq accumulates THROUGH HBM via input_output_aliases
# (read-modify-write of the [block_q, d] f32 block each step — the TPU
# grid is sequential per core, so the RMW is race-free; traffic is
# ~0.5 MB/step against ~3.4 ms of matmul per step). Guarded to n_q >= 4
# so the write-back of block i (step t-n_q) always lands before its
# prefetch (step t-1) under double buffering.
FLASH_MERGED_BWD = _os.environ.get("HYV_FLASH_MERGED_BWD", "1") == "1"
# Kill switch for the fixed-max ("bounded") forward softmax, requested
# per-call via flash_attention(bounded_logits=True). The wan_dit self/cross
# attention paths opt in: they qk-RMSNorm over the MODEL dim (fused
# qknorm_rope kernel; the reference applies the same norms,
# wan/modules/model.py WanSelfAttention/WanCrossAttention), which tames
# the logits: ||q_hat||_2 <= max|gamma_q| sqrt(D_model), RoPE preserves
# norms, and with energy SPREAD across heads the per-head logit is
# |s| ~ max|gamma_q| max|gamma_k| sqrt(head_dim) ~= 11.3 — far inside the
# fp32-exp safe range (|s| < ~70: exp(70) * 75,600 keys * |v| stays
# finite). This is an EMPIRICAL property, not a worst-case proof: the
# full-dim norm admits per-head energy concentration up to
# gamma_q gamma_k D_model / sqrt(head_dim) (~452 for 14B dims), so a
# pathological checkpoint could overflow. Overflow is LOUD, not silent:
# inf/inf -> NaN outputs, caught by the compiled finite guards every
# train step (training/prfl.py) and visible as garbage frames in
# serving; set HYV_FLASH_BOUNDED=0 to force the shifted softmax.
# attn_logit_bound() reports both the typical and worst-case figures for
# a checkpoint's gains (scripts/validate_released.py prints them).
# Why opt in at all: the forward is VPU-BOUND at long sequence (at
# 10h x 75.6k the MXU floor is ~149 ms while ~5 VPU softmax passes cost
# ~143 ms); dropping the online-softmax max/shift/rescale chain cuts the
# per-tile VPU passes to ~3 (exp, sum, cast) — measured 188 -> 166 ms.
# The lse output keeps the same natural-units value, so ring merges and
# the lse-recompute backward are unchanged. Only engages when there is no
# per-row dynamic mask; the "user" k_valid path keeps the shifted softmax.
FLASH_BOUNDED = _os.environ.get("HYV_FLASH_BOUNDED", "1") == "1"
# Kill switch for the int8 qk^T serving forward, requested per-call via
# flash_attention(qk_int8=True) — see that docstring.
FLASH_QK8 = _os.environ.get("HYV_FLASH_QK8", "1") == "1"


def _encode_bounded(masked):
    """'+b'-suffixed mode string: fixed-max forward requested by a caller
    that guarantees tame logits (wan_dit qk-norm paths)."""
    if masked is None:
        return "none+b"
    if masked == "padfree":
        return "padfree+b"
    return masked  # "pad"/"user" keep the shifted softmax


def _decode_mode(masked):
    """-> (base mode, bounded). FLASH_BOUNDED=0 vetoes at trace time."""
    if isinstance(masked, str) and masked.endswith("+b"):
        base = masked[:-2]
        return (None if base == "none" else base), FLASH_BOUNDED
    return masked, False


def attn_logit_bound(params, head_dim: int = 128):
    """(typical, worst_case) attention-logit bounds from a checkpoint's
    qk-RMSNorm gains. The norm runs over the FULL model dim D
    (||RMSNorm(x) * gamma||_2 <= max|gamma| sqrt(D); RoPE preserves
    norms), so:

    * typical (per-head energy spread ~ uniformly, the trained-network
      regime qk-norm produces): max|gamma_q| max|gamma_k| sqrt(head_dim)
    * worst case (ALL q and k energy concentrated in one aligned head):
      max|gamma_q| max|gamma_k| D / sqrt(head_dim)

    The fixed-max forward (FLASH_BOUNDED) is exact while the REALIZED
    logits stay below ~70; the typical figure sits ~6x under that, the
    worst case above it for 14B dims — see the FLASH_BOUNDED comment for
    the failure mode (loud NaN) and the kill switch. Returns (0.0, 0.0)
    if no norm_q/norm_k leaves are found (callers must treat that as
    'unknown', not 'safe')."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    gq = gk = 0.0
    dim = 0
    for path, leaf in flat:
        name = str(path[-1]) if path else ""
        if "norm_q" in name:
            gq = max(gq, float(jnp.max(jnp.abs(leaf))))
            dim = max(dim, int(leaf.shape[-1]))  # [D] or scan-stacked [L, D]
        elif "norm_k" in name:  # norm_k and norm_k_img
            gk = max(gk, float(jnp.max(jnp.abs(leaf))))
    if not (gq and gk and dim):
        return 0.0, 0.0
    return (gq * gk * head_dim ** 0.5,
            gq * gk * dim / head_dim ** 0.5)


def _pad_mode() -> str:
    """Mask mode for static zero-padding (reads the module global so A/B
    monkeypatching works): 'padfree' (arithmetic correction) or 'pad'."""
    return "padfree" if FLASH_PADFREE else "pad"


def _mask_cols(s, valid, off):
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + off
    return jnp.where(col < valid, s, NEG_INF)


def _apply_mask(s, mask_mode, len_ref, lk, block_k, k_idx, n_k):
    """mask_mode: None | "user" (per-row dynamic k_valid_len) | "pad"
    (static padding only — the valid bound is the compile-time lk, no
    scalar-prefetch read). NOTE: an earlier revision branched the pad mask
    to the last k block with lax.cond; measured 117 -> 74 TF/s on v5e —
    scf.if in the inner loop defeats Mosaic's pipelining. Unconditional
    masking costs ~3 VPU passes and keeps the pipeline."""
    if mask_mode == "user":
        return _mask_cols(s, len_ref[pl.program_id(0)], k_idx * block_k)
    if mask_mode == "pad":
        return _mask_cols(s, lk, k_idx * block_k)
    return s  # None or "padfree": no in-tile masking


def _interpret() -> bool:
    """Pallas interpret mode on CPU backends (tests / virtual meshes):
    the kernel runs as plain XLA ops, numerically identical. Override with
    PALLAS_INTERPRET=0/1 (e.g. chipless TPU AOT lowering from a CPU
    process, scripts/memory_audit_14b.py)."""
    import os

    ov = os.environ.get("PALLAS_INTERPRET")
    if ov is not None:
        return ov == "1"
    import jax

    return jax.default_backend() == "cpu"


def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, block_k, scale, n_k, masked, lk,
                exp2, n_pad=0):
    k_idx = pl.program_id(2)
    expf = jnp.exp2 if exp2 else jnp.exp
    e_sc = LOG2E if exp2 else 1.0

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # fold the softmax scale (and log2(e) under the exp2 softmax) into the
    # [BQ, D] q block — 25x fewer elements than scaling the [BQ, BK] score
    # matrix on the VPU
    q = (q_ref[0].astype(jnp.float32) * (scale * e_sc)).astype(q_ref.dtype)
    k = k_ref[0]  # [BK, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]

    s = _apply_mask(s, masked, len_ref, lk, block_k, k_idx, n_k)

    m_prev = m_ref[:]  # [BQ, 128] (broadcast lanes)
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [BQ, 1]
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = expf(m_prev[:, :1] - m_new[:, :1])  # [BQ, 1]
    p = expf(s - m_new[:, :1])  # [BQ, BK] f32
    l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(k_idx == n_k - 1)
    def _finish():
        l = l_ref[:, :1]
        if n_pad:  # padfree: remove the zero-padded columns' exp(-m) mass
            l = l - n_pad * expf(-m_ref[:, :1])
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lb = jnp.broadcast_to(l, m_ref.shape)
        # natural-units lse at the kernel boundary
        if exp2:
            lse_ref[0] = (m_ref[:] + jnp.log2(jnp.maximum(lb, 1e-30))) * LN2
        else:
            lse_ref[0] = m_ref[:] + jnp.log(jnp.maximum(lb, 1e-30))


def _fwd_kernel_bounded(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                        acc_ref, l_ref, *, block_k, scale, n_k, lk,
                        exp2, n_pad=0):
    """Fixed-max streaming forward (FLASH_BOUNDED): no running max, no
    shift, no rescale chain — p = exp(s) accumulated directly. Exact for
    bounded logits (see FLASH_BOUNDED); zero-padded key columns contribute
    exp(0) = 1 each to l, removed as a constant at finish."""
    k_idx = pl.program_id(2)
    expf = jnp.exp2 if exp2 else jnp.exp
    e_sc = LOG2E if exp2 else 1.0

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = (q_ref[0].astype(jnp.float32) * (scale * e_sc)).astype(q_ref.dtype)
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, BK]
    p = expf(s)
    l_new = l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(k_idx == n_k - 1)
    def _finish():
        l = l_ref[:, :1] - n_pad
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lb = jnp.broadcast_to(jnp.maximum(l, 1e-30), l_ref.shape)
        # natural-units lse at the kernel boundary (same VALUE as the
        # shifted path's m + log(sum exp(s - m)))
        lse_ref[0] = (jnp.log2(lb) * LN2) if exp2 else jnp.log(lb)


def _fwd_kernel_bounded_qk8(sqk_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                            acc_ref, l_ref, *, n_k, exp2, n_pad=0):
    """Fixed-max streaming forward with the qk^T matmul on the int8 MXU
    (serving-only; see flash_attention(qk_int8=True)). q/k arrive s8 with
    per-(batch*head) symmetric scales pre-multiplied into sqk (softmax
    scale and log2e folded in too); s8 x s8 -> s32 runs at 2x the bf16 MXU
    rate (measured 329 TOPS at this tile vs 178 TF/s bf16 —
    scripts/probe_int8_rate.py), and the dequant is ONE fused elementwise
    chain over the score tile: p = exp2(s32 * c). Zero-padded key columns
    quantize to 0 -> s32 = 0 -> p = 1, removed as a constant at finish
    (the padfree correction). p.v stays bf16."""
    k_idx = pl.program_id(2)
    expf = jnp.exp2 if exp2 else jnp.exp

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    c = sqk_ref[pl.program_id(0)]
    s32 = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [BQ, BK]
    p = expf(s32.astype(jnp.float32) * c)
    l_new = l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(k_idx == n_k - 1)
    def _finish():
        l = l_ref[:, :1] - n_pad
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lb = jnp.broadcast_to(jnp.maximum(l, 1e-30), l_ref.shape)
        lse_ref[0] = (jnp.log2(lb) * LN2) if exp2 else jnp.log(lb)


def _fwd_kernel_single(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                       *, block_k, scale, masked, lk, exp2, n_pad=0,
                       bounded=False):
    """Single-k-block forward (the full-K fast path): plain softmax, no
    online-update scratch or rescale chain. bounded=True additionally
    drops the max-shift (see FLASH_BOUNDED)."""
    expf = jnp.exp2 if exp2 else jnp.exp
    e_sc = LOG2E if exp2 else 1.0
    q = (q_ref[0].astype(jnp.float32) * (scale * e_sc)).astype(q_ref.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    s = _apply_mask(s, masked, len_ref, lk, block_k, 0, 1)
    if bounded:
        m = None
        p = expf(s)
        l = jnp.sum(p, axis=1, keepdims=True)
        if n_pad:  # padfree: pad columns contribute exp(0) = 1 each
            l = l - n_pad
    else:
        m = jnp.max(s, axis=1, keepdims=True)  # [BQ, 1]
        p = expf(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        if n_pad:  # padfree: remove the zero-padded columns' exp(-m) mass
            l = l - n_pad * expf(-m)
    l_safe = jnp.where(l <= 0.0, 1.0, l)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lm = jnp.maximum(l, 1e-30)
    if exp2:
        lse = jnp.log2(lm) * LN2 if bounded else (m + jnp.log2(lm)) * LN2
    else:
        lse = jnp.log(lm) if bounded else m + jnp.log(lm)
    lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_acc, *, block_k, scale, n_k, masked, lk, exp2):
    k_idx = pl.program_id(2)
    expf = jnp.exp2 if exp2 else jnp.exp
    e_sc = LOG2E if exp2 else 1.0

    @pl.when(k_idx == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    # scale (+log2e under the exp2 softmax) folds into the [*, D] operands:
    # q for the score matmul, k for the dq matmul — small scalings replace
    # per-element [BQ, BK] VPU passes
    q = (q_ref[0].astype(jnp.float32) * (scale * e_sc)).astype(q_ref.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = _apply_mask(s, masked, len_ref, lk, block_k, k_idx, n_k)
    p = expf(s - lse_ref[0][:, :1] * e_sc)  # [BQ, BK]
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1])
    k_s = (k.astype(jnp.float32) * scale).astype(k.dtype)
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k_s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == n_k - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, block_k, scale, n_q,
                masked, lk, exp2):
    q_idx = pl.program_id(2)
    expf = jnp.exp2 if exp2 else jnp.exp
    e_sc = LOG2E if exp2 else 1.0

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    # two scaled q views: score matmul wants scale*log2e (exp2 softmax),
    # the dk matmul wants plain scale (ds is d/d(natural logits))
    qf = q_ref[0].astype(jnp.float32)
    q = (qf * (scale * e_sc)).astype(q_ref.dtype)  # [BQ, D]
    q_s = (qf * scale).astype(q_ref.dtype)
    k = k_ref[0]  # [BK, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    k_idx = pl.program_id(1)
    s = _apply_mask(s, masked, len_ref, lk, block_k, k_idx,
                    pl.num_programs(1))
    p = expf(s - lse_ref[0][:, :1] * e_sc)  # [BQ, BK]
    # dv += P^T dO
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1])  # [BQ, BK]
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q_s.dtype), q_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dqkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                 *refs, block_k, scale, n_q, masked, lk, exp2, alias):
    """Single-pass backward (FLASH_MERGED_BWD): grid (bn, n_k, n_q), k
    outer. s/p/dp/ds computed once per cell; dk/dv accumulate in scratch
    over the inner q sweep; dq accumulates through the aliased f32 HBM
    buffer (dq_in_ref is the same memory as dq_ref, fetched per step).
    alias=False (interpret mode, where the Pallas interpreter does not
    thread writes back through input_output_aliases): dq is emitted as
    per-k-block partials [BN, n_k, Lq, D] summed by the caller."""
    if alias:
        dq_in_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    else:
        dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    q_idx = pl.program_id(2)
    expf = jnp.exp2 if exp2 else jnp.exp
    e_sc = LOG2E if exp2 else 1.0

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qf = q_ref[0].astype(jnp.float32)
    q = (qf * (scale * e_sc)).astype(q_ref.dtype)  # [BQ, D]
    q_s = (qf * scale).astype(q_ref.dtype)
    k = k_ref[0]  # [BK, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    k_idx = pl.program_id(1)
    s = _apply_mask(s, masked, len_ref, lk, block_k, k_idx,
                    pl.num_programs(1))
    p = expf(s - lse_ref[0][:, :1] * e_sc)  # [BQ, BK]
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1])  # [BQ, BK]
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q_s.dtype), q_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    k_s = (k.astype(jnp.float32) * scale).astype(k.dtype)
    dq_contrib = jax.lax.dot_general(
        ds.astype(k.dtype), k_s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if alias:
        dq_ref[0] = dq_in_ref[0] + dq_contrib
    else:
        dq_ref[0, 0] = dq_contrib

    @pl.when(q_idx == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _pad_len(l, b):
    return (l + b - 1) // b * b


def pick_blocks(lq: int, lk: int):
    """(block_q, block_k) for the forward kernels.

    block_k: full-K single-block when it fits VMEM (no online-softmax
    rescale chain), else the measured 2048 streaming block.
    block_q: minimize q PADDING (padded rows are pure wasted MXU work —
    e.g. 3120 tokens padded to 3584 at block 512 burns 15%); but in the
    multi-k streaming regime keep blocks >= 384 so the per-q-block k/v
    re-streaming stays hidden under the MXU time (DMA/compute crossover
    is ~bq 240 on v5e at d=128)."""
    lk128 = _pad_len(lk, 128)
    full_k = lk128 <= FULL_K_MAX
    # streaming regime: pick block_k from {2048, 1920} by minimal k
    # padding (prefer the larger on ties). Forward is flat between them,
    # but the BACKWARD pays for padded keys: at 18,900 tokens bk 1920
    # (1.6% pad) measures 263.5 ms fwd+bwd vs 268.9 at bk 2048 (8.4%
    # pad); at 75,600 tokens bk 2048 (0.23% pad) wins the forward sweep
    # (scripts/profile_flash_ab.py, profile_flash_75k.py).
    if full_k:
        block_k = lk128
    else:
        block_k = min((DEFAULT_BLOCK_K, 1920),
                      key=lambda bk: (_pad_len(lk, bk), -bk))
    lq128 = _pad_len(lq, 128)
    if lq128 <= DEFAULT_BLOCK_Q:
        return lq128, block_k
    cands = (256, 384, 512) if full_k else (384, 512)
    block_q = min(cands, key=lambda bq: (_pad_len(lq, bq), -bq))
    # in the streaming regime k/v re-reads scale with n_q: prefer the
    # largest block unless the padding saving is material (>4%) — at 75.6k
    # tokens 512 vs 384 is 25% less k/v traffic for 0.17% more padding
    big = max(cands)
    if _pad_len(lq, big) <= _pad_len(lq, block_q) * 1.04:
        block_q = big
    return block_q, block_k


def _divisor_block(l_p: int, cap: int) -> int:
    """Largest block <= cap that divides l_p, preferring multiples of 128
    (MXU tiles), falling back to multiples of 8 (sublanes)."""
    for mult in (128, 8):
        for b in range(cap - cap % mult, mult - 1, -mult):
            if l_p % b == 0:
                return b
    return l_p  # l_p < 8 never happens for real sequences


def _bwd_blocks(lq_p: int, lk_p: int, block_q: int, block_k: int):
    """Backward block sizes: the dq/dkv kernels hold ~3 [BQ, BK] fp32
    temporaries on the Mosaic stack, so the full-K forward blocks
    (e.g. 512x3200 = 6.5 MB/temp) overflow the 16 MB scoped-VMEM limit.
    Cap at 512x2048 (12 MB of temporaries — fits, and the larger k block
    halves the q/do re-streaming: measured 793.8 -> 767.9 ms fwd+bwd at
    10 heads x 75,600 x d128 vs the round-2 512x1024 cap; 256x2048 is
    worse, scripts/profile_flash_75k.py)."""
    bq = block_q if block_q <= 512 else _divisor_block(lq_p, 512)
    bk = block_k if block_k <= 2048 else _divisor_block(lk_p, 2048)
    return bq, bk


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def _flash(q, k, v, valid, block_q, block_k, masked, lk_true):
    o, _ = _flash_fwd_impl(q, k, v, valid, block_q, block_k, masked, lk_true)
    return o


def _flash_fwd_impl(q, k, v, valid, block_q, block_k, masked, lk_true):
    masked, bounded = _decode_mode(masked)
    bn, lq, d = q.shape
    lk = k.shape[1]
    n_q = lq // block_q
    n_k = lk // block_k
    scale = 1.0 / (d ** 0.5)
    if n_k == 1:
        return _flash_fwd_single(q, k, v, valid, block_q, block_k, scale,
                                 masked, lk_true, bounded)
    if bounded:
        kernel = functools.partial(
            _fwd_kernel_bounded, block_k=block_k, scale=scale, n_k=n_k,
            lk=lk_true, exp2=FLASH_EXP2,
            n_pad=(lk - lk_true) if masked == "padfree" else 0,
        )
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _fwd_kernel, block_k=block_k, scale=scale, n_k=n_k, masked=masked,
            lk=lk_true, exp2=FLASH_EXP2,
            n_pad=(lk - lk_true) if masked == "padfree" else 0,
        )
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    grid = (bn, n_q, n_k)
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, s_: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, s_: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, s_: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, s_: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i, j, s_: (b, i, 0)),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bn, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bn, lq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(valid, q, k, v)
    return o, lse


def _flash_fwd_single(q, k, v, valid, block_q, block_k, scale, masked,
                      lk_true, bounded=False):
    """Scratch-free forward for the full-K (single k block) case."""
    bn, lq, d = q.shape
    kernel = functools.partial(
        _fwd_kernel_single, block_k=block_k, scale=scale, masked=masked,
        lk=lk_true, exp2=FLASH_EXP2,
        n_pad=(k.shape[1] - lk_true) if masked == "padfree" else 0,
        bounded=bounded,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, lq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, s_: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, s_: (b, 0, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, s_: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, s_: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i, s_: (b, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bn, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bn, lq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(valid, q, k, v)
    return o, lse


def _quantize_bn(x):
    """[BN, L, D] float -> (s8 values, per-BN f32 scales). Symmetric
    per-(batch*head) quantization: one scalar per attention head — the
    dequant then folds into the kernel's exp2 argument at zero extra VPU
    passes (a per-token scale would cost two [BQ, BK] multiplies per tile,
    exactly the VPU passes the bounded forward exists to remove). qk-RMSNorm
    equalizes per-token energy, so the per-head scalar loses little; the
    padfree zero columns quantize to exactly 0."""
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=(1, 2))  # [BN]
    s = jnp.maximum(a, 1e-30) / 127.0
    x8 = jnp.clip(jnp.round(xf / s[:, None, None]), -127, 127
                  ).astype(jnp.int8)
    return x8, s


def _flash_fwd_qk8(q, k, v, block_q, block_k, lk_true):
    """Bounded+padfree forward with int8 qk^T (no dynamic k_valid path,
    no backward: serving only — see flash_attention(qk_int8=True))."""
    bn, lq, d = q.shape
    lk = k.shape[1]
    n_q = lq // block_q
    n_k = lk // block_k
    scale = 1.0 / (d ** 0.5)
    q8, sq = _quantize_bn(q)
    k8, sk = _quantize_bn(k)
    sqk = sq * sk * (scale * (LOG2E if FLASH_EXP2 else 1.0))  # [BN]
    kernel = functools.partial(
        _fwd_kernel_bounded_qk8, n_k=n_k, exp2=FLASH_EXP2,
        n_pad=lk - lk_true,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, n_q, n_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, s_: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, s_: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, s_: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, s_: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i, j, s_: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bn, lq, d), v.dtype),
            jax.ShapeDtypeStruct((bn, lq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(sqk, q8, k8, v)
    return o, lse


def _flash_fwd(q, k, v, valid, block_q, block_k, masked, lk_true):
    o, lse = _flash_fwd_impl(q, k, v, valid, block_q, block_k, masked,
                             lk_true)
    # residual lse kept [BN, Lq, 1]: the kernel's 128-lane broadcast copy
    # would otherwise dominate residual memory under attention-saving remat
    # policies (387 MB vs 3 MB per 14B block)
    return o, (q, k, v, valid, o, lse[..., :1])


def _flash_bwd(block_q, block_k, masked, lk_true, res, do):
    q, k, v, valid, o, lse = res
    masked, _ = _decode_mode(masked)  # backward always lse-recomputes
    if masked == "padfree":
        # pad columns need no backward masking: ds pad columns multiply
        # zero k rows in dq (= 0), and their dk/dv contributions land only
        # in pad rows the caller slices off
        masked = None
    lse = jnp.broadcast_to(lse, (*lse.shape[:2], 128))
    bn, lq, d = q.shape
    lk = k.shape[1]
    if FLASH_MERGED_BWD and lq // _bwd_blocks_merged(lq, lk)[0] >= 4:
        return _flash_bwd_merged(block_q, block_k, masked, lk_true,
                                 (q, k, v, valid, o, lse), do)
    block_q, block_k = _bwd_blocks(lq, lk, block_q, block_k)
    n_q = lq // block_q
    n_k = lk // block_k
    scale = 1.0 / (d ** 0.5)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [BN, Lq, 1]
    delta = jnp.broadcast_to(delta, (bn, lq, 128))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_k=block_k, scale=scale, n_k=n_k,
                          masked=masked, lk=lk_true, exp2=FLASH_EXP2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, n_q, n_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, s_: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, s_: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, s_: (b, j, 0)),
                pl.BlockSpec((1, block_q, d), lambda b, i, j, s_: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i, j, s_: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i, j, s_: (b, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j, s_: (b, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bn, lq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(valid, q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_k=block_k, scale=scale, n_q=n_q,
                          masked=masked, lk=lk_true, exp2=FLASH_EXP2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, n_k, n_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, j, i, s_: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, j, i, s_: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, j, i, s_: (b, j, 0)),
                pl.BlockSpec((1, block_q, d), lambda b, j, i, s_: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, j, i, s_: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, j, i, s_: (b, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda b, j, i, s_: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, j, i, s_: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bn, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bn, lk, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(valid, q, k, v, do, lse, delta)
    return dq, dk, dv, None


def _bwd_blocks_merged(lq_p: int, lk_p: int):
    """Merged-backward block sizes. The kernel holds four [BQ, BK] fp32
    temporaries (s, p, dp, ds) on the Mosaic stack plus the dk/dv
    accumulators, so BK caps lower than the split kernels': 512x1024 is
    ~8 MB of temporaries + ~3 MB of blocks/accumulators. Cap 1280
    measured best on v5e (169.8 ms vs 174.5 at cap-1024's bk 768 for the
    40h x 18,900 shape; at 75,776 keys both resolve to bk 1024 — 170.2
    TF/s, scripts/profile_flash_merged.py); 1536 would put the four
    temporaries at 12.6 MB, over the scoped-VMEM comfort line."""
    import os
    cap_k = int(os.environ.get("HYV_FLASH_MERGED_BK", "1280"))
    cap_q = int(os.environ.get("HYV_FLASH_MERGED_BQ", "512"))
    bq = _divisor_block(lq_p, cap_q)
    bk = _divisor_block(lk_p, cap_k)
    return bq, bk


def _flash_bwd_merged(block_q, block_k, masked, lk_true, res, do):
    """Single-pass backward: 5 matmuls per (q, k) cell instead of the
    split kernels' 7 (see FLASH_MERGED_BWD)."""
    q, k, v, valid, o, lse = res
    bn, lq, d = q.shape
    lk = k.shape[1]
    block_q, block_k = _bwd_blocks_merged(lq, lk)
    n_q = lq // block_q
    n_k = lk // block_k
    scale = 1.0 / (d ** 0.5)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [BN, Lq, 1]
    delta = jnp.broadcast_to(delta, (bn, lq, 128))

    # the Pallas interpreter does not thread writes through
    # input_output_aliases; emit dq per-k-block partials there instead
    alias = not _interpret()
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i, s_: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i, s_: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i, s_: (b, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda b, j, i, s_: (b, i, 0)),
        pl.BlockSpec((1, block_q, 128), lambda b, j, i, s_: (b, i, 0)),
        pl.BlockSpec((1, block_q, 128), lambda b, j, i, s_: (b, i, 0)),
    ]
    operands = [valid, q, k, v, do, lse, delta]
    if alias:
        dq_spec = pl.BlockSpec((1, block_q, d), lambda b, j, i, s_: (b, i, 0))
        dq_shape = jax.ShapeDtypeStruct((bn, lq, d), jnp.float32)
        in_specs.append(dq_spec)
        operands.append(jnp.zeros((bn, lq, d), jnp.float32))
        # operand 7 (dq0; scalar-prefetch valid counts as operand 0)
        # aliases output 0 — the in-kernel read-modify-write accumulator
        aliases = {7: 0}
    else:
        dq_spec = pl.BlockSpec((1, 1, block_q, d),
                               lambda b, j, i, s_: (b, j, i, 0))
        dq_shape = jax.ShapeDtypeStruct((bn, n_k, lq, d), jnp.float32)
        aliases = {}

    dq, dk, dv = pl.pallas_call(
        functools.partial(_dqkv_kernel, block_k=block_k, scale=scale,
                          n_q=n_q, masked=masked, lk=lk_true,
                          exp2=FLASH_EXP2, alias=alias),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, n_k, n_q),
            in_specs=in_specs,
            out_specs=[
                dq_spec,
                pl.BlockSpec((1, block_k, d), lambda b, j, i, s_: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, j, i, s_: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            dq_shape,
            jax.ShapeDtypeStruct((bn, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bn, lk, d), v.dtype),
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(*operands)
    if not alias:
        dq = dq.sum(axis=1)
    return dq.astype(q.dtype), dk, dv, None


# optimize_remat: under jax.checkpoint policies that save this op's output
# (wan_dit remat_policy="attn"), the remat machinery may compute residuals
# from the saved output instead of re-running the opaque Pallas forward —
# the jax-recommended arrangement for flash kernels under remat.
_flash.defvjp(_flash_fwd, _flash_bwd, optimize_remat=True)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_valid_len: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    qk_layout: str = "blnd",
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Flash attention; returns [B, Lq, N, D]. v is BLND; q/k are BLND, or
    already head-major [B, N, L, D] (qk_layout="bnld" — the qknorm_rope
    kernel's output layout, saving the moveaxis relayout here).

    bounded_logits: caller asserts its logits stay far inside the
    fp32-exp range (e.g. qk-RMSNormed attention) — enables the fixed-max
    forward softmax (see FLASH_BOUNDED). Default OFF: un-normed callers
    get the overflow-safe shifted softmax.

    qk_int8: SERVING-ONLY (forward has no VJP — differentiating it gives
    zero grads through the rounding): quantize q/k per head to s8 and run
    the qk^T matmul on the int8 MXU at ~2x the bf16 rate (W8A8 attention,
    the attention-side sibling of WanConfig.quant_dense; quantization
    error ~0.5% on the logits — gate per checkpoint like quant_int8 in
    scripts/validate_released.py). Requires bounded_logits and no
    k_valid_len; multi-k-block shapes only (the single-block cross-attn
    path stays bf16 — it is ~10% of serving attention time). Kill switch
    HYV_FLASH_QK8=0."""
    bnld_in = qk_layout == "bnld"
    if bnld_in:
        b, n, lq, d = q.shape
        lk = k.shape[2]
    else:
        b, lq, n, d = q.shape
        lk = k.shape[1]
    assert d % 128 == 0, f"head_dim {d} must be a multiple of 128"

    auto_q, auto_k = pick_blocks(lq, lk)
    block_q = min(block_q, _pad_len(lq, 128)) if block_q else auto_q
    block_k = min(block_k, _pad_len(lk, 128)) if block_k else auto_k
    lq_p = _pad_len(lq, block_q)
    lk_p = _pad_len(lk, block_k)

    def bnld(x, lp, head_major=False):
        if head_major:
            x = x.reshape(b * n, x.shape[2], d)
        else:
            x = jnp.moveaxis(x, 2, 1).reshape(b * n, x.shape[1], d)
        if lp != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))
        return x

    qb = bnld(q, lq_p, bnld_in)
    kb = bnld(k, lk_p, bnld_in)
    vb = bnld(v, lk_p)

    if k_valid_len is None:
        valid = jnp.full((b,), lk, jnp.int32)
    else:
        valid = k_valid_len.astype(jnp.int32)
    valid = jnp.repeat(valid, n)  # [B*N] scalar-prefetch vector

    # mask mode: None when every key is valid (no user mask, no k
    # padding — saves ~3 VPU passes over [BQ, BK] per cell); "padfree"
    # (default) corrects for static zero-padding arithmetically with NO
    # per-tile masking (see FLASH_PADFREE above); "pad" is the iota-masked
    # A/B fallback; "user" for dynamic per-row k_valid_len
    if k_valid_len is not None:
        masked = "user"
    elif lk_p != lk:
        masked = _pad_mode()
    else:
        masked = None
    if (qk_int8 and FLASH_QK8 and bounded_logits and FLASH_BOUNDED
            and k_valid_len is None and lk_p // block_k > 1):
        o, _ = _flash_fwd_qk8(qb, kb, vb, block_q, block_k, lk)
    else:
        if bounded_logits:
            masked = _encode_bounded(masked)
        o = _flash(qb, kb, vb, valid, block_q, block_k, masked, lk)
    o = o[:, :lq].reshape(b, n, lq, d)
    return jnp.moveaxis(o, 1, 2)
