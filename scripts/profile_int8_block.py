"""Real-chip A/B: one 14B-dimension WanBlock forward, bf16 vs int8 W8A8
dense (WanConfig.quant_dense — ops/quant.py), at the 720p sp=4 local
length (18,900 tokens; same harness as profile_14b_block.py).

The raw matmul probe measured int8 at 2.2x the bf16 MXU rate (350 TOPS vs
158 TF/s at the ffn shape); the block-level win is diluted by the flash
kernel, which stays bf16 — expected ~1.2x at this shape where attention
is ~40% of the block, more at shorter sequences.
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
from hyvideo_prfl_tpu.ops import quant

DIM, HEADS, FFN = 5120, 40, 13824
GRID = (21, 45, 20)
L = GRID[0] * GRID[1] * GRID[2]
K = 2


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


def main():
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    cos, sin = rope_tables_rolled(GRID, DIM // HEADS)
    x = jnp.ones((1, L, DIM), jnp.float32) * 0.1
    ctx = jnp.ones((1, 512, DIM), jnp.bfloat16) * 0.1
    e6 = jnp.ones((1, 6, DIM), jnp.float32) * 0.1

    results = {}
    p_bf16 = None
    for tag, qd in (("bf16", None), ("int8", "int8")):
        cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                                num_heads=HEADS, num_layers=1, remat=False,
                                quant_dense=qd)
        blk = wan_dit.WanBlock(cfg)
        if qd is None:
            p = blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos, sin)
            p_bf16 = p
        else:
            qshapes = jax.eval_shape(
                lambda: blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos,
                                 sin))
            p = quant.quantize_params(p_bf16, qshapes)

        @jax.jit
        def fwdK(p, x, blk=blk):
            def body(x, _):
                return blk.apply(p, x, e6, ctx, cos, sin).astype(x.dtype), \
                    None
            x, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(x)

        t = (timeit(f"block_fwd_{tag}", fwdK, p, x) - rt) / K
        results[tag] = t
        del p

    print(json.dumps({
        "block_fwd_bf16_ms": round(results["bf16"] * 1e3, 1),
        "block_fwd_int8_ms": round(results["int8"] * 1e3, 1),
        "speedup": round(results["bf16"] / results["int8"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
