"""Wan video DiT backbone, TPU-native flax implementation.

Parity target: reference `wan/modules/model.py:413-729` (WanModel and
submodules). Re-designed for XLA rather than translated:

* Channel-last [B, F, H, W, C] video tensors; patch embedding is a reshape +
  one Dense (kernel == stride 3D conv is exactly a non-overlapping patch
  matmul — MXU-friendly, no conv layout shuffles).
* Static shapes: one resolution bucket per compiled step; the reference's
  per-sample python lists + pad-to-seq_len (model.py:578-587) become a single
  batched tensor (all samples in a batch share a grid, as the reference's
  training configs effectively require anyway).
* Blocks run under `nn.scan` with stacked parameters [L, ...]: one compile of
  one block, natural FSDP sharding of the stacked axis, `nn.remat` for
  activation checkpointing (replacing apply_fsdp_checkpointing,
  fsdp_utils.py:23-50), and the PAVRM "first-k blocks" trimmed model is a
  parameter slice (train_pavrm.py:200-237).
* fp32 islands exactly as the reference: time/adaLN modulation fp32
  (model.py:339-341, :590-594), norms fp32, RoPE fp32 (reference float64,
  unavailable on TPU), residual stream fp32, matmuls bf16.
* Sequence parallelism via GSPMD sharding constraints (parallel/sharding.py)
  instead of explicit all_to_all_4D autograd functions: tokens sharded on
  "sp", heads sharded inside attention — XLA inserts the Ulysses all_to_all
  pair (replacing model.py:183-196 + communication.py:40-160).
* Feature taps: `output_features` returns activations after the selected
  blocks (model.py:656-670) for the PAVRM latent reward path.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from ..ops.qknorm_rope import rmsnorm_only, rmsnorm_rope
from ..ops.stream import ln_scale_shift
from ..parallel import sharding as sharding_mod
from ..parallel.sharding import ShardingPolicy, constrain
from .rope import apply_rope_rolled, rope_tables_rolled

T5_CONTEXT_TOKEN_NUMBER = 512
FIRST_LAST_FRAME_CONTEXT_TOKEN_NUMBER = 257 * 2


@dataclasses.dataclass(frozen=True)
class WanConfig:
    """Model hyperparameters (reference wan/configs/*, model.py:423-439)."""

    model_type: str = "t2v"  # t2v | i2v | flf2v
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16
    # residual-stream dtype: fp32 matches the reference's numerics
    # (model.py:339-358 keeps x fp32 between blocks); bf16 halves the
    # HBM traffic of the stream + norms at some precision cost
    residual_dtype: Any = jnp.float32
    remat: bool = True  # activation checkpointing per block
    # remat policy: "full" recomputes everything (min memory);
    # "dots" saves matmul outputs with no batch dims (nothing in this model
    # qualifies — kept for parity with jax naming); "dots_all" saves ALL
    # matmul outputs (~64 MB/block at dim 1280/3120 tok: skips the forward
    # recompute in backward where memory permits; NOT for 14B@75.6k);
    # "attn" saves the flash-attention custom_vjp residuals (q/k/v/o/lse,
    # exposed via optimize_remat=True on the kernel) so the backward never
    # re-runs the flash FORWARD — the hot 40%-of-recompute op — at
    # ~0.8 GB/block extra residents at 14B x 18.9k tokens
    remat_policy: str = "full"
    # lax.scan unroll factor for the block stack: >1 lets XLA overlap the
    # next layer's stacked-weight DMA with the current layer's compute
    # (the scan itself does not prefetch xs slices)
    scan_unroll: int = 1
    # "int8" runs the ten block matmuls (self/cross qkvo + k_img/v_img +
    # ffn) as W8A8 int8 MXU dots — serving-only, ~2.2x the bf16 dense rate
    # on v5e (ops/quant.py; load via quant.quantize_params). Embeds, adaLN,
    # head, and the attention kernel stay bf16/fp32.
    quant_dense: Optional[str] = None
    # "int8" additionally runs the SELF-attention qk^T matmul on the int8
    # MXU (per-head symmetric q/k quantization inside the bounded flash
    # forward — ops/flash_attention.flash_attention(qk_int8=True)).
    # Serving-only like quant_dense; requires qk_norm (the bounded-logit
    # guarantee); cross-attention (single-k-block) stays bf16. Kill switch
    # HYV_FLASH_QK8=0.
    quant_attn: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


# 14B / 1.3B presets (wan_t2v_14B.py:20-27, wan_t2v_1_3B.py, wan_i2v_14B.py)
def t2v_14b(**kw):
    return WanConfig(model_type="t2v", dim=5120, ffn_dim=13824, num_heads=40,
                     num_layers=40, **kw)


def i2v_14b(**kw):
    return WanConfig(model_type="i2v", in_dim=36, dim=5120, ffn_dim=13824,
                     num_heads=40, num_layers=40, **kw)


def t2v_1_3b(**kw):
    return WanConfig(model_type="t2v", dim=1536, ffn_dim=8960, num_heads=12,
                     num_layers=30, **kw)


def i2v_1_3b(**kw):
    """1.3B-sized i2v variant (no released reference counterpart; used for
    smoke/i2v tests at small scale with the full 36-channel conditioning)."""
    return WanConfig(model_type="i2v", in_dim=36, dim=1536, ffn_dim=8960,
                     num_heads=12, num_layers=30, **kw)


def flf2v_14b(**kw):
    return WanConfig(model_type="flf2v", in_dim=36, dim=5120, ffn_dim=13824,
                     num_heads=40, num_layers=40, **kw)


def tiny_test(**kw):
    """2-layer toy config for tests."""
    kw.setdefault("dim", 128)
    kw.setdefault("ffn_dim", 256)
    kw.setdefault("num_heads", 2)
    kw.setdefault("num_layers", 2)
    kw.setdefault("freq_dim", 32)
    kw.setdefault("text_dim", 64)
    return WanConfig(**kw)


_BLOCK_DENSE = ("self_attn", "cross_attn", "ffn_0", "ffn_2")


def _attn_saveable_policy(prim, *_, **__):
    """Save the flash-attention custom_vjp call's outputs + residuals
    (staged as a `remat_opt` primitive by optimize_remat=True in
    ops/flash_attention.py) so the block backward reuses the forward's
    kernel run instead of recomputing it. Everything else (dense matmuls,
    norms) is recomputed as under the "full" policy. Verified numerically
    identical to "full" (tests/test_wan_dit.py remat tests)."""
    return prim.name == "remat_opt"


def _cast_block_dense_params(dtype, tree):
    """Cast the blocks' dense kernels/biases to the compute dtype, leaving
    norm scales (norm_q/k/k_img, norm3_*) and modulation in fp32. Applied to
    the STACKED scan tree once per forward via nn.map_variables."""
    import flax

    flat = flax.traverse_util.flatten_dict(tree)
    out = {
        path: (
            leaf.astype(dtype)
            if path[-1] in ("kernel", "bias")
            and any(p in _BLOCK_DENSE for p in path)
            else leaf
        )
        for path, leaf in flat.items()
    }
    return flax.traverse_util.unflatten_dict(out)


def patchify(x: jnp.ndarray, patch_size: Tuple[int, int, int]):
    """[B, F, H, W, C] video -> ([B, L, cells, C] token-cell layout, grid).

    cells = pt*ph*pw; flattening order matches the in-model patch embedding
    (position-major, channel-fastest), so `tokens.reshape(b, L, cells*C)` is
    bit-identical to patch-embedding the video directly, and concatenating
    two token-cell tensors on the channel axis reproduces a channel concat
    done in video layout (the i2v mask+cond cat, model.py:574-575).

    Why this exists: the sampling/rollout scans carry the solver state in
    THIS layout so the (ring, sp)-token sharding never has to convert to the
    W-sharded video layout inside the loop — the conversion SPMD cannot
    express (it falls back to "involuntary full rematerialization",
    replicating the full latent every denoising step). Video layout now
    appears exactly twice per sampling chain: patchify once before the scan,
    unpatchify once after.
    """
    b, f, hh, ww, c = x.shape
    pt, ph, pw = patch_size
    gf, gh, gw = f // pt, hh // ph, ww // pw
    xp = x.reshape(b, gf, pt, gh, ph, gw, pw, c)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, gf * gh * gw, pt * ph * pw, c)
    return xp, (gf, gh, gw)


def unpatchify(tokens: jnp.ndarray, grid: Tuple[int, int, int],
               patch_size: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, L, cells, C] token-cell layout -> [B, F, H, W, C] video.

    Exact inverse of `patchify`; identical math to the in-model unpatchify
    exit (model.py:704-712 unpatchify)."""
    b, _, _, c = tokens.shape
    gf, gh, gw = grid
    pt, ph, pw = patch_size
    out = tokens.reshape(b, gf, gh, gw, pt, ph, pw, c)
    return out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        b, gf * pt, gh * ph, gw * pw, c)


def _batch_only(policy):
    """P(batch_axis) — every non-batch dim replicated (trailing dims of a
    PartitionSpec are unsharded)."""
    return jax.sharding.PartitionSpec(policy.token_cells[0])


def patchify_sharded(x: jnp.ndarray, patch_size, policy):
    """`patchify` with the mesh-safe layout discipline.

    The conversion runs on a sequence-REPLICATED intermediate (batch stays
    on "data") and only the final constraint takes the token sharding:
    replicated -> sharded is a free local slice, whereas reshaping a
    W-sharded video directly into an L-sharded token layout is the
    transform SPMD can only do by involuntary full rematerialization.
    EVERY intermediate is pinned batch-only so the partitioner cannot
    back-propagate the token sharding into the reshape/transpose chain
    (observed: it invents a transposed-device-order (gf, gh) sharding for
    the 8D intermediate and falls back to full remat). Call ONCE per
    sampling/rollout chain, outside the scan."""
    if policy is None:
        return patchify(x, patch_size)
    ce = sharding_mod.constrain_even
    rep = _batch_only(policy)
    b, f, hh, ww, c = x.shape
    pt, ph, pw = patch_size
    gf, gh, gw = f // pt, hh // ph, ww // pw
    x = ce(x, rep)
    xp = ce(x.reshape(b, gf, pt, gh, ph, gw, pw, c), rep)
    xp = ce(xp.transpose(0, 1, 3, 5, 2, 4, 6, 7), rep)
    tokens = ce(xp.reshape(b, gf * gh * gw, pt * ph * pw, c), rep)
    tokens = ce(tokens, policy.token_cells)
    return tokens, (gf, gh, gw)


def unpatchify_sharded(tokens: jnp.ndarray, grid, patch_size, policy):
    """`unpatchify` with the mesh-safe layout discipline: all_gather the
    sequence shards (batch stays on "data"), reshape locally with every
    intermediate pinned batch-only, re-partition to the W-sharded video
    layout. One explicit gather instead of SPMD's replicate-per-occurrence
    fallback. Call ONCE, outside the scan."""
    if policy is None:
        return unpatchify(tokens, grid, patch_size)
    ce = sharding_mod.constrain_even
    rep = _batch_only(policy)
    b, _, _, c = tokens.shape
    gf, gh, gw = grid
    pt, ph, pw = patch_size
    tokens = ce(tokens, rep)
    out = ce(tokens.reshape(b, gf, gh, gw, pt, ph, pw, c), rep)
    out = ce(out.transpose(0, 1, 4, 2, 5, 3, 6, 7), rep)
    video = ce(out.reshape(b, gf * pt, gh * ph, gw * pw, c), rep)
    return ce(video, policy.video)


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """[cos | sin] sinusoid table (model.py:22-32), fp32."""
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(
        10000.0, -jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = jnp.outer(pos, freqs)
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)


def _rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """fp32 RMS norm * weight, cast back to x.dtype (model.py:106-122)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y.astype(x.dtype) * weight.astype(x.dtype))


def _layer_norm(x: jnp.ndarray, eps: float, scale=None, bias=None) -> jnp.ndarray:
    """fp32 LayerNorm, optionally affine, cast back (model.py:125-135)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _dense(name, features, dtype, init="xavier", quant=None):
    if quant == "int8":
        return QuantDense(features, name=name, dtype=dtype)
    kernel_init = (
        nn.initializers.xavier_uniform()
        if init == "xavier"
        else nn.initializers.normal(stddev=0.02)
        if init == "normal02"
        else nn.initializers.zeros_init()
    )
    return nn.Dense(
        features, name=name, dtype=dtype, param_dtype=jnp.float32,
        kernel_init=kernel_init, bias_init=nn.initializers.zeros_init(),
    )


class QuantDense(nn.Module):
    """W8A8 int8 dense (serving only; WanConfig.quant_dense="int8").

    Parameter tree: kernel_q int8 [D, F] + kernel_scale fp32 [F] + bias
    fp32 [F] — produced from a bf16/fp32 tree by ops/quant.quantize_params
    at load time (random init quantizes a fresh xavier kernel so smoke
    paths work without a checkpoint; q and scale draw independent keys
    there, which is magnitude-correct — consistency comes from the
    quantize_params path, the only one that matters numerically)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_dense, quantize_weight

        d = x.shape[-1]

        def kq_init(key):
            w = nn.initializers.xavier_uniform()(key, (d, self.features),
                                                 jnp.float32)
            return quantize_weight(w)[0]

        def ks_init(key):
            w = nn.initializers.xavier_uniform()(key, (d, self.features),
                                                 jnp.float32)
            return quantize_weight(w)[1]

        wq = self.param("kernel_q", kq_init)
        ws = self.param("kernel_scale", ks_init)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return int8_dense(x.astype(self.dtype), wq, ws, b)


class SelfAttention(nn.Module):
    """qk-RMSNorm + 3D RoPE + flash attention (model.py:138-201)."""

    cfg: WanConfig
    policy: Optional[ShardingPolicy] = None

    @nn.compact
    def __call__(self, x, cos, sin):
        cfg, policy = self.cfg, self.policy
        b, l, _ = x.shape
        n, d = cfg.num_heads, cfg.head_dim
        cd = cfg.compute_dtype
        x = x.astype(cd)
        qd = cfg.quant_dense
        q = _dense("q", cfg.dim, cd, quant=qd)(x)
        k = _dense("k", cfg.dim, cd, quant=qd)(x)
        v = _dense("v", cfg.dim, cd, quant=qd)(x).reshape(b, l, n, d)
        if cfg.qk_norm:
            # fused RMSNorm+rope Pallas kernel: the unfused chain is ~1/3 of
            # the forward wall-clock. Output is head-major [B, N, L, D] (the
            # flash kernel's layout — see ops/qknorm_rope.py docstring).
            wq = self.param("norm_q", nn.initializers.ones, (cfg.dim,))
            wk = self.param("norm_k", nn.initializers.ones, (cfg.dim,))
            q = rmsnorm_rope(q, wq, cos, sin, n, cfg.eps)
            k = rmsnorm_rope(k, wk, cos, sin, n, cfg.eps)
            qk_layout = "bnld"
        else:
            q = apply_rope_rolled(q.reshape(b, l, n, d), cos, sin)
            k = apply_rope_rolled(k.reshape(b, l, n, d), cos, sin)
            qk_layout = "blnd"
        if policy is not None and (policy.usp or policy.shard_map_ulysses):
            if qk_layout == "bnld":  # shard_map paths take token-major qkv
                q = jnp.moveaxis(q, 1, 2)
                k = jnp.moveaxis(k, 1, 2)
            q = constrain(q, policy, "attn_heads_sp_tokens")
            k = constrain(k, policy, "attn_heads_sp_tokens")
            v = constrain(v, policy, "attn_heads_sp_tokens")
            qk8 = cfg.quant_attn == "int8" and cfg.qk_norm
            if policy.usp:
                # USP inference: ring x ulysses shard_map attention
                # (inference_prfl.py:71-82 topology). qk_int8 engages only
                # at ring degree 1 (pure Ulysses); ring > 1 keeps bf16
                # (per-hop online-softmax merges).
                from ..ops.ring_attention import usp_attention

                # qk-RMSNorm tames the logits -> fixed-max flash forward
                out = usp_attention(q, k, v, bounded_logits=cfg.qk_norm,
                                    qk_int8=qk8)
            else:
                # explicit all_to_all Ulysses; pallas flash runs per device
                from ..ops.attention import ulysses_attention

                out = ulysses_attention(q, k, v, bounded_logits=cfg.qk_norm,
                                        qk_int8=qk8)
        else:
            # GSPMD Ulysses: shard heads / gather sequence around the op
            hspec = "attn_heads_bnld" if qk_layout == "bnld" else "attn_heads"
            q = constrain(q, policy, hspec)
            k = constrain(k, policy, hspec)
            v = constrain(v, policy, "attn_heads")
            out = dot_product_attention(q, k, v, qk_layout=qk_layout,
                                        bounded_logits=cfg.qk_norm,
                                        qk_int8=cfg.quant_attn == "int8"
                                        and cfg.qk_norm)
            out = constrain(out, policy, "attn_heads")
        out = out.reshape(b, l, cfg.dim)
        out = constrain(out, policy, "tokens")
        return _dense("o", cfg.dim, cd, quant=cfg.quant_dense)(out)


class CrossAttention(nn.Module):
    """Text (+image for i2v/flf2v) cross attention (model.py:204-271)."""

    cfg: WanConfig
    policy: Optional[ShardingPolicy] = None

    @nn.compact
    def __call__(self, x, context):
        cfg, policy = self.cfg, self.policy
        b, l, _ = x.shape
        n, d = cfg.num_heads, cfg.head_dim
        cd = cfg.compute_dtype
        x = x.astype(cd)
        is_i2v = cfg.model_type in ("i2v", "flf2v")
        if is_i2v:
            img_len = context.shape[1] - T5_CONTEXT_TOKEN_NUMBER
            context_img = context[:, :img_len]
            context = context[:, img_len:]
        context = context.astype(cd)
        qd = cfg.quant_dense
        q = _dense("q", cfg.dim, cd, quant=qd)(x)
        k = _dense("k", cfg.dim, cd, quant=qd)(context)
        v = _dense("v", cfg.dim, cd, quant=qd)(context).reshape(b, -1, n, d)
        if cfg.qk_norm:
            wq = self.param("norm_q", nn.initializers.ones, (cfg.dim,))
            wk = self.param("norm_k", nn.initializers.ones, (cfg.dim,))
            q = rmsnorm_only(q, wq, n, cfg.eps)      # [B, N, L, D]
            k = rmsnorm_only(k, wk, n, cfg.eps)
            qk_layout = "bnld"
        else:
            q = q.reshape(b, l, n, d)
            k = k.reshape(b, -1, n, d)
            qk_layout = "blnd"
        # multichip: q stays token-sharded, the short context replicated —
        # per-device flash on the local q chunk (zero fwd collectives)
        from ..ops.attention import (
            token_parallel_applicable, token_parallel_attention,
        )

        if policy is not None and token_parallel_applicable(
                b, l, policy.tokens):
            attn = functools.partial(token_parallel_attention,
                                     tokens_spec=policy.tokens,
                                     bounded_logits=cfg.qk_norm)
        else:
            attn = functools.partial(dot_product_attention,
                                     bounded_logits=cfg.qk_norm)
        out = attn(q, k, v, qk_layout=qk_layout)
        if is_i2v:
            context_img = context_img.astype(cd)
            k_img = _dense("k_img", cfg.dim, cd, quant=qd)(context_img)
            v_img = _dense("v_img", cfg.dim, cd, quant=qd)(context_img).reshape(
                b, -1, n, d)
            if cfg.qk_norm:
                k_img = rmsnorm_only(
                    k_img,
                    self.param("norm_k_img", nn.initializers.ones, (cfg.dim,)),
                    n, cfg.eps,
                )
            else:
                k_img = k_img.reshape(b, -1, n, d)
            out = out + attn(q, k_img, v_img, qk_layout=qk_layout)
        out = out.reshape(b, l, cfg.dim)
        return _dense("o", cfg.dim, cd, quant=cfg.quant_dense)(out)


class WanBlock(nn.Module):
    """DiT block: adaLN-modulated self-attn, cross-attn, FFN
    (model.py:280-359). Residual stream fp32; matmuls compute_dtype."""

    cfg: WanConfig
    policy: Optional[ShardingPolicy] = None

    @nn.compact
    def __call__(self, x, e, context, cos, sin):
        cfg, policy = self.cfg, self.policy
        cd = cfg.compute_dtype
        mod = self.param(
            "modulation",
            nn.initializers.normal(stddev=1.0 / math.sqrt(cfg.dim)),
            (1, 6, cfg.dim),
        )
        # e: [B, 6, dim] fp32; modulation add in fp32 (model.py:339-341)
        rd = cfg.residual_dtype
        e6 = (mod.astype(jnp.float32) + e.astype(jnp.float32))
        e0, e1, e2, e3, e4, e5 = [e6[:, i][:, None, :].astype(rd)
                                  for i in range(6)]
        # fp32 stream: LN+modulate through the fused Pallas kernel (ONE pass
        # of x; the unfused XLA lowering measures 13 ms/pass at the 14B
        # Ulysses shard — scripts/profile_stream_fused.py). The bf16-stream
        # option keeps the inline math (its modulate rounds at bf16, which
        # the fp32 kernel intentionally does not reproduce).
        fused_ln = rd == jnp.float32

        x = x.astype(rd)
        if fused_ln:
            h = ln_scale_shift(x, 1.0 + e6[:, 1], e6[:, 0], out_dtype=cd)
        else:
            h = (_layer_norm(x, 1e-6).astype(rd) * (1.0 + e1) + e0).astype(cd)
        y = SelfAttention(cfg, policy, name="self_attn")(h, cos, sin)
        x = x + y.astype(rd) * e2
        x = constrain(x, policy, "tokens")

        if cfg.cross_attn_norm:
            scale = self.param("norm3_scale", nn.initializers.ones, (cfg.dim,))
            bias = self.param("norm3_bias", nn.initializers.zeros, (cfg.dim,))
            if fused_ln:
                h = ln_scale_shift(x, scale, bias, out_dtype=cd)
            else:
                h = _layer_norm(x, 1e-6, scale, bias)
        else:
            h = x
        y = CrossAttention(cfg, policy, name="cross_attn")(h.astype(cd), context)
        x = x + y.astype(rd)

        if fused_ln:
            h = ln_scale_shift(x, 1.0 + e6[:, 4], e6[:, 3], out_dtype=cd)
        else:
            h = (_layer_norm(x, 1e-6).astype(rd) * (1.0 + e4) + e3).astype(cd)
        h = _dense("ffn_0", cfg.ffn_dim, cd, quant=cfg.quant_dense)(h)
        h = nn.gelu(h, approximate=True)
        h = _dense("ffn_2", cfg.dim, cd, quant=cfg.quant_dense)(h)
        x = x + h.astype(rd) * e5
        x = constrain(x, policy, "tokens")
        return x


class Head(nn.Module):
    """Final modulated projection to patch pixels (model.py:362-389)."""

    cfg: WanConfig

    @nn.compact
    def __call__(self, x, e):
        cfg = self.cfg
        out_dim = math.prod(cfg.patch_size) * cfg.out_dim
        mod = self.param(
            "modulation",
            nn.initializers.normal(stddev=1.0 / math.sqrt(cfg.dim)),
            (1, 2, cfg.dim),
        )
        e2 = mod.astype(jnp.float32) + e.astype(jnp.float32)[:, None, :]
        x = x.astype(jnp.float32)
        h = ln_scale_shift(x, 1.0 + e2[:, 1], e2[:, 0],
                           out_dtype=jnp.float32)
        return _dense("head", out_dim, jnp.float32, init="zeros")(h)


class MLPProj(nn.Module):
    """CLIP image-context projector (model.py:392-410)."""

    cfg: WanConfig

    @nn.compact
    def __call__(self, image_embeds):
        cfg = self.cfg
        flf = cfg.model_type == "flf2v"
        x = image_embeds.astype(jnp.float32)
        if flf:
            b, n, d = x.shape
            x = x.reshape(-1, 2 * n, d)
            # (1, 514, 1280) for the released ViT-H/14 encoder
            # (FIRST_LAST_FRAME_CONTEXT_TOKEN_NUMBER); sized from the input
            # so tiny smoke encoders work too
            pos = self.param(
                "emb_pos", nn.initializers.zeros, (1, 2 * n, d),
            )
            x = x + pos
        scale0 = self.param("ln0_scale", nn.initializers.ones, (x.shape[-1],))
        bias0 = self.param("ln0_bias", nn.initializers.zeros, (x.shape[-1],))
        x = _layer_norm(x, 1e-5, scale0, bias0)
        x = _dense("fc1", x.shape[-1], jnp.float32)(x)
        x = nn.gelu(x, approximate=False)
        x = _dense("fc2", cfg.dim, jnp.float32)(x)
        scale1 = self.param("ln1_scale", nn.initializers.ones, (cfg.dim,))
        bias1 = self.param("ln1_bias", nn.initializers.zeros, (cfg.dim,))
        return _layer_norm(x, 1e-5, scale1, bias1)


class WanModel(nn.Module):
    """The video DiT (model.py:413-729).

    __call__(x, t, context, y=None, clip_fea=None, output_features=False,
             selected_layers=(), num_layers_override=None, policy=None)

    x: [B, F, H, W, in_dim(part)] latent video, channel-last — OR the
       token-cell layout [B, L, cells, in_dim(part)] from `patchify` with
       `grid` passed (the sampling/rollout scans use this so the solver
       carry never changes layout inside the loop; see patchify docstring).
    t: [B] or scalar timesteps.
    context: [B, text_len, text_dim] padded text embeddings.
    y: optional conditioning latents [B, F, H, W, C_y], channel-concatenated
       (i2v mask+cond; reference cats on channel dim, model.py:574-575).
       Must be in the same layout as x (token-cell when x is).
    Returns [B, F, H, W, out_dim] fp32 (or [B, L, cells, out_dim] in token
    mode), or stacked features [num_selected, B, L, dim] when
    output_features=True.
    """

    cfg: WanConfig
    policy: Optional[ShardingPolicy] = None

    @nn.compact
    def __call__(
        self,
        x,
        t,
        context,
        y=None,
        clip_fea=None,
        output_features: bool = False,
        selected_layers: Sequence[int] = (),
        num_layers_override: Optional[int] = None,
        skip_blocks=None,
        residual_in=None,
        output_residual: bool = False,
        grid: Optional[Tuple[int, int, int]] = None,
    ):
        cfg, policy = self.cfg, self.policy
        cd = cfg.compute_dtype
        token_mode = x.ndim == 4
        if y is not None:
            # token-cell concat on the channel axis reproduces the video-
            # layout channel concat exactly (see patchify docstring)
            x = jnp.concatenate([x, y], axis=-1)
        pt, ph, pw = cfg.patch_size
        if token_mode:
            assert grid is not None, "token-layout input requires grid"
            gf, gh, gw = grid
            b, seq_len, cells, c_in = x.shape
            assert cells == pt * ph * pw and seq_len == gf * gh * gw
            xp = x.reshape(b, seq_len, cells * c_in)
        else:
            b, f, hh, ww, c_in = x.shape
            gf, gh, gw = f // pt, hh // ph, ww // pw
            grid = (gf, gh, gw)
            seq_len = gf * gh * gw

            # --- patch embedding: reshape + Dense (== stride=kernel Conv3d)
            xp = x.reshape(b, gf, pt, gh, ph, gw, pw, c_in)
            xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                b, seq_len, pt * ph * pw * c_in
            )
        h = _dense("patch_embedding", cfg.dim, cd)(xp.astype(cd))
        h = h.astype(cfg.residual_dtype)
        h = constrain(h, policy, "tokens")

        # --- time embedding (fp32 island, model.py:590-594) ---
        t = jnp.atleast_1d(jnp.asarray(t))
        if t.shape[0] != b:
            t = jnp.broadcast_to(t, (b,))
        e = sinusoidal_embedding_1d(cfg.freq_dim, t)
        e = _dense("time_0", cfg.dim, jnp.float32, init="normal02")(e)
        # constrain BEFORE the silu: the FSDP-sharded time_0 kernel otherwise
        # leaves this [B, dim] tensor feature-sharded and SPMD falls back to
        # replicate-then-partition (involuntary full rematerialization)
        e = constrain(e, policy, "time_embed")
        e = nn.silu(e)
        e = _dense("time_2", cfg.dim, jnp.float32, init="normal02")(e)
        e = constrain(e, policy, "time_embed")
        e0 = nn.silu(e)
        # NOTE: the partitioner satisfies the replicated e0 constraint by
        # all-gathering the fp32 time_2/time_proj KERNELS (not the tiny
        # activation) — measured in the compiled 14B step at ~1.4 GiB wire
        # (~7 ms) per step, emitted as windowed collective matmuls that
        # overlap with compute. Pinning the raw dot outputs onto the
        # kernels' column shards removes the gathers but introduces
        # involuntary-full-rematerialization warnings on the [B, dim]
        # boundary (tried and reverted; the zero-warning invariant wins).
        e0 = _dense("time_proj", cfg.dim * 6, jnp.float32)(e0)
        e0 = e0.reshape(b, 6, cfg.dim)
        e0 = constrain(e0, policy, "time_mod")

        # --- text embedding ---
        ctx = _dense("text_0", cfg.dim, cd, init="normal02")(context.astype(cd))
        ctx = nn.gelu(ctx, approximate=True)
        ctx = _dense("text_2", cfg.dim, cd, init="normal02")(ctx)
        if clip_fea is not None:
            ctx_img = MLPProj(cfg, name="img_emb")(clip_fea).astype(cd)
            ctx = jnp.concatenate([ctx_img, ctx], axis=1)
        ctx = constrain(ctx, policy, "context")

        # --- RoPE tables (host-precomputed, roll formulation) ---
        cos, sin = rope_tables_rolled(grid, cfg.head_dim)
        if policy is not None:
            # pin the tables REPLICATED once, outside the block scan: left
            # unpinned, SPMD back-propagates attention-reshape shardings
            # onto the broadcast tables inside every layer and falls back to
            # involuntary full rematerialization (observed under
            # hybrid_full FSDP). They are small (~10 MB bf16 at 75.6k).
            cos = jax.lax.with_sharding_constraint(cos, policy.rope_tables)
            sin = jax.lax.with_sharding_constraint(sin, policy.rope_tables)

        # --- blocks under scan with stacked params ---
        n_layers = num_layers_override or cfg.num_layers
        sel = tuple(selected_layers)
        n_sel = len(sel)
        sel_arr = jnp.asarray(sel, jnp.int32) if n_sel else None

        block_cls = WanBlock
        if cfg.remat:
            policy_fn = {
                "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                "dots_all": jax.checkpoint_policies.dots_saveable,
                "attn": _attn_saveable_policy,
            }.get(cfg.remat_policy)
            block_cls = nn.remat(
                WanBlock,
                static_argnums=(),
                prevent_cse=False,
                policy=policy_fn,
            )

        feats0 = (
            jnp.zeros((n_sel, b, seq_len, cfg.dim), cfg.residual_dtype)
            if n_sel
            else None
        )

        def body(block, carry, _):
            x, feats, idx = carry
            x = block(x, e0, ctx, cos, sin)
            if feats is not None:
                # tap after block `idx` when (idx+1) in selected_layers
                hit = (sel_arr == idx + 1)  # [n_sel]
                feats = jnp.where(hit[:, None, None, None], x[None], feats)
            return (x, feats, idx + 1), None

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=n_layers,
            unroll=min(cfg.scan_unroll, n_layers),
        )
        if cfg.compute_dtype != jnp.float32:
            # hoist the fp32->bf16 weight cast OUT of the scan: XLA does not
            # lift the per-slice cast of stacked scan params, so each block
            # otherwise re-reads fp32 weights and casts in-loop (measured
            # +0.295 ms/block at bench scale, scripts/profile_overhead.py).
            # Master weights stay fp32 (the reference's fp32-master +
            # bf16-autocast arrangement, fsdp_utils.py:53-63); norm scales
            # and adaLN modulation stay fp32 islands (model.py:339-341).
            scan = nn.map_variables(
                scan, "params",
                trans_in_fn=functools.partial(
                    _cast_block_dense_params, cfg.compute_dtype),
                # storage side (used at init): masters are fp32
                trans_out_fn=functools.partial(
                    _cast_block_dense_params, jnp.float32),
                init=True,
            )
        blocks = block_cls(cfg, policy, name="blocks")

        def run_blocks(h):
            (h2, feats, _), _ = scan(blocks, (h, feats0, jnp.int32(0)), None)
            return h2, feats

        if skip_blocks is None:
            h_in = h
            h, feats = run_blocks(h)
        else:
            # TeaCache path (inference only, ops/teacache.py): lax.cond picks
            # between the full stack and the cached-residual add. Both
            # branches are traced (so params resolve); one executes.
            assert not output_features, "feature taps not valid under teacache"
            h_in = h
            h = jax.lax.cond(
                skip_blocks,
                lambda x: x + residual_in.astype(x.dtype),
                lambda x: run_blocks(x)[0],
                h,
            )
            feats = None

        residual_out = h - h_in

        if output_features:
            return feats

        # --- head + unpatchify ---
        out = Head(cfg, name="head")(h, e)
        if token_mode:
            # stay token-major: the caller unpatchifies once, outside any
            # scan, so SPMD never resharded token->video inside the loop
            out = out.reshape(b, seq_len, pt * ph * pw, cfg.out_dim)
            out = constrain(out, policy, "token_cells")
        else:
            out = out.reshape(b, gf, gh, gw, pt, ph, pw, cfg.out_dim)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
                b, gf * pt, gh * ph, gw * pw, cfg.out_dim
            )
            out = constrain(out, policy, "video")
        out = out.astype(jnp.float32)
        if output_residual:
            # e (fp32 time embed) is TeaCache's modulation input
            # (model.py:624-637)
            return out, e, residual_out
        return out


def time_embed_only(params, cfg: WanConfig, t):
    """The fp32 time-embedding e [B, dim] (model.py:590-592) computed alone —
    the cheap TeaCache gate input."""
    t = jnp.atleast_1d(jnp.asarray(t, jnp.float32))
    e = sinusoidal_embedding_1d(cfg.freq_dim, t)
    p = params["params"]
    e = e @ p["time_0"]["kernel"] + p["time_0"]["bias"]
    e = nn.silu(e)
    return e @ p["time_2"]["kernel"] + p["time_2"]["bias"]


def init_params(cfg: WanConfig, rng, sample_shape=(1, 4, 8, 8, None),
                text_len=None, clip_shape=None):
    """Initialize a parameter pytree with a tiny dummy forward.

    clip_shape: optional (tokens, dim) of the CLIP visual features (defaults
    to the released ViT-H/14 257x1280; tiny smoke encoders differ)."""
    b, f, hh, ww, _ = sample_shape
    x = jnp.zeros((b, f, hh, ww, 16 if cfg.model_type == "t2v" else 16), jnp.float32)
    y = (
        jnp.zeros((b, f, hh, ww, cfg.in_dim - 16), jnp.float32)
        if cfg.in_dim > 16
        else None
    )
    ctx = jnp.zeros((b, text_len or cfg.text_len, cfg.text_dim), jnp.float32)
    # flf2v convention: first+last frame CLIP tokens stacked on batch
    # ([2B, 257, 1280]), fused to [B, 514, dim] inside MLPProj
    ct, cd_ = clip_shape or (257, 1280)
    clip = (
        jnp.zeros((b * (2 if cfg.model_type == "flf2v" else 1), ct, cd_),
                  jnp.float32)
        if cfg.model_type in ("i2v", "flf2v")
        else None
    )
    t = jnp.zeros((b,), jnp.float32)
    model = WanModel(cfg)
    return model.init(rng, x, t, ctx, y=y, clip_fea=clip)
