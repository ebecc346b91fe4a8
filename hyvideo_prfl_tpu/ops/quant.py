"""Int8 dense path for serving (W8A8, beyond-reference feature).

The reference serves the DiT in bf16 only. TPU MXUs run int8 x int8 ->
int32 at ~2x the bf16 rate (v5e: 394 int8 TOPS vs 197 bf16 TFLOP/s;
measured on the real chip: 350 TOPS vs 158 TF/s at the 14B ffn shape =
2.2x — scripts/profile_int8_block.py), so quantizing the ten block
matmuls (self/cross qkvo + k_img/v_img + ffn) buys serving throughput
where the dense share of the block is large. Attention itself (the flash
kernel) and the numerically sensitive fp32 islands (adaLN/time/text
embeds, head) stay in bf16/fp32.

Scheme — the standard symmetric absmax recipe:
  weights      int8 per-OUT-CHANNEL scales, quantized offline at load
               time (`quantize_params`, mirroring the bf16 serving cast)
  activations  int8 per-TOKEN dynamic scales computed in-graph (absmax
               over the feature axis; two cheap stream passes, fused by
               XLA, amortized by the D x F matmul)
  accumulate   int32 on the MXU, rescaled in fp32: y = (x8 @ w8) * xs*ws

Opt-in via WanConfig.quant_dense="int8" (--quant int8 on the inference
CLI). Quality is checkpoint-dependent: validate against bf16 samples on
the released weights before production use (validate_released covers the
harness; tests pin SNR on random weights and tiny-model sample drift).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_weight(w: jnp.ndarray):
    """Per-out-channel symmetric int8 quantization of a dense kernel.

    w: [..., D, F] (a trailing [D, F] matrix, optionally stacked over
    leading layer axes — the nn.scan block stack). Scales reduce over the
    contraction axis D (axis=-2) so each output channel rescales exactly.
    Returns (q int8 same shape, scale fp32 with D-axis dropped)."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2) / 127.0
    s = jnp.maximum(s, _EPS)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s[..., None, :]),
                 -127, 127).astype(jnp.int8)
    return q, s


def int8_dense(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
               bias: Optional[jnp.ndarray] = None,
               out_dtype: Optional[Any] = None) -> jnp.ndarray:
    """y = x @ dequant(wq, ws) + bias via an int8 MXU matmul.

    x [..., D] float; wq [D, F] int8; ws [F] fp32. Per-token dynamic
    activation scales (absmax over D). Tokens whose row is all-zero get
    scale EPS (quantizes to exact zeros — correct)."""
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, _EPS)
    x8 = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    o = jax.lax.dot_general(
        x8, wq, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = o.astype(jnp.float32) * (xs * ws)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def quantize_params(params, quant_shapes):
    """bf16/fp32 param tree -> the quant model's tree (load-time transform,
    like the bf16 serving cast; scripts/inference.py --quant int8).

    `quant_shapes` = jax.eval_shape of the quant model's init: wherever it
    holds `kernel_q`/`kernel_scale` and the source holds `kernel`, the
    kernel is quantized; every other leaf passes through (cast to the
    target dtype so fp32 islands stay fp32). Walking the TARGET structure
    makes the transform mechanical — no duplicated list of which layers
    the model quantizes."""
    def walk(src, dst):
        if isinstance(dst, dict):
            out = {}
            if "kernel_q" in dst:
                q, s = quantize_weight(jnp.asarray(src["kernel"]))
                out["kernel_q"], out["kernel_scale"] = q, s
            for key, sub in dst.items():
                if key in ("kernel_q", "kernel_scale"):
                    continue
                out[key] = walk(src[key], sub)
            return out
        leaf = jnp.asarray(src)
        return leaf.astype(dst.dtype) if leaf.dtype != dst.dtype else leaf

    return walk(params, quant_shapes)
