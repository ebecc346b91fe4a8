"""Isolate the 14B block's fp32-stream elementwise cost (the adaLN
modulate / layer-norm / residual-add chain between the matmul+flash
custom calls) at the 18,900-token Ulysses shard.

Motivation: block fwd measures 132.9 ms (r3e) while flash (43.8) + dense
matmuls at their measured rates (~70) leave ~17 ms unexplained — ~3x the
~5.8 ms bandwidth roofline of the six stream passes. This script measures
each segment in isolation so a fused-kernel decision is made on data:

* ln_mod:   h = LN(x) * (1 + e) + e0 -> bf16      (pre-attn / pre-ffn)
* ln_aff:   h = LN(x; scale, bias) -> bf16        (norm3, cross path)
* add_gate: x = x + y * e                          (post-attn / post-ffn)
* chain:    all six segments composed (no matmuls) — what XLA makes of
            the full stream with no custom-call barriers
* block:    the real WanBlock fwd (barriers included), for the residual

Roofline at [1, 18900, 5120]: one fp32 read+write = 0.74 ms at ~1 TB/s
HBM (v5e ~819 GB/s); see STATUS.md for the measured table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.models.rope import rope_tables_rolled

if os.environ.get("HYV_PROF_SMALL") == "1":  # CPU smoke of the script
    DIM, HEADS, FFN = 128, 2, 256
    GRID = (2, 6, 4)
else:
    DIM, HEADS, FFN = 5120, 40, 13824
    GRID = (21, 45, 20)
L = GRID[0] * GRID[1] * GRID[2]
K = 4


def timeit(tag, fn, *args, n=3):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(json.dumps({"tag": tag, "s": round(best, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return best


def scanK(fn):
    """Chain K applications of fn(x, *rest) -> x-like, fetch one scalar."""
    @jax.jit
    def run(x, *rest):
        def body(x, _):
            return fn(x, *rest), None
        x, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(x[..., :8].astype(jnp.float32))
    return run


def main():
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    x = jnp.ones((1, L, DIM), jnp.float32) * 0.1
    e0 = jnp.ones((1, 1, DIM), jnp.float32) * 0.01
    e1 = jnp.ones((1, 1, DIM), jnp.float32) * 0.02
    scale = jnp.ones((DIM,), jnp.float32)
    bias = jnp.zeros((DIM,), jnp.float32)
    y_bf = jnp.ones((1, L, DIM), jnp.bfloat16) * 0.1

    res = {}

    def ln_mod(x, e0, e1):
        h = wan_dit._layer_norm(x, 1e-6) * (1.0 + e1) + e0
        return h.astype(jnp.bfloat16).astype(jnp.float32) * 0.999 + x * 1e-3

    t = (timeit("ln_mod", scanK(ln_mod), x, e0, e1) - rt) / K
    res["ln_mod_ms"] = round(t * 1e3, 2)

    def ln_aff(x, scale, bias):
        h = wan_dit._layer_norm(x, 1e-6, scale, bias)
        return h.astype(jnp.bfloat16).astype(jnp.float32) * 0.999 + x * 1e-3

    t = (timeit("ln_aff", scanK(ln_aff), x, scale, bias) - rt) / K
    res["ln_aff_ms"] = round(t * 1e3, 2)

    def add_gate(x, y, e1):
        return x + y.astype(jnp.float32) * e1

    t = (timeit("add_gate", scanK(add_gate), x, y_bf, e1) - rt) / K
    res["add_gate_ms"] = round(t * 1e3, 2)

    def chain(x, e0, e1, scale, bias, y):
        h1 = wan_dit._layer_norm(x, 1e-6) * (1.0 + e1) + e0
        x = x + h1.astype(jnp.bfloat16).astype(jnp.float32) * e1
        h2 = wan_dit._layer_norm(x, 1e-6, scale, bias)
        x = x + h2.astype(jnp.bfloat16).astype(jnp.float32)
        h3 = wan_dit._layer_norm(x, 1e-6) * (1.0 + e1) + e0
        x = x + h3.astype(jnp.bfloat16).astype(jnp.float32) * e1
        return x

    t = (timeit("chain6", scanK(chain),
                x, e0, e1, scale, bias, y_bf) - rt) / K
    res["chain6_ms"] = round(t * 1e3, 2)

    # the real block, for the residual accounting
    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=1, remat=False)
    blk = wan_dit.WanBlock(cfg)
    cos, sin = rope_tables_rolled(GRID, cfg.head_dim)
    ctx = jnp.ones((1, 512, DIM), jnp.bfloat16) * 0.1
    e6 = jnp.ones((1, 6, DIM), jnp.float32) * 0.1
    params = blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos, sin)

    def block(x, p):
        return blk.apply(p, x, e6, ctx, cos, sin).astype(x.dtype)

    t = (timeit("block_fwd", scanK(block), x, params) - rt) / K
    res["block_fwd_ms"] = round(t * 1e3, 2)

    bytes_rw = L * DIM * 4 * 2
    res["roofline_fp32_pass_ms"] = round(bytes_rw / 819e9 * 1e3, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
