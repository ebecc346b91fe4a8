"""Ground the 14B extrapolation: ONE real 14B-dimension WanBlock (dim 5120,
ffn 13824, 40 heads) at the per-device 720p x 81f Ulysses sequence length
(75,600 / sp4 = 18,900 tokens), forward and forward+backward, measured on
the actual chip. The full 14B step is 40 of these blocks plus embeds/head —
multiplying this measurement out is the extrapolation bench.py's FLOP model
approximates."""

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

DIM, HEADS, FFN = 5120, 40, 13824
GRID = (21, 45, 20)  # 18,900 tokens = 75,600 / sp=4 (ulysses 720p shard)
L = GRID[0] * GRID[1] * GRID[2]


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


def block_flops(l):
    dense = 2.0 * (8 * DIM * DIM + 2 * DIM * FFN) * l  # self+cross+ffn GEMMs
    attn = 4.0 * l * l * DIM  # self-attention core
    cross = 4.0 * l * 512 * DIM
    return dense + attn + cross


def main():
    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=1, remat=False)
    blk = wan_dit.WanBlock(cfg)
    cos, sin = rope_tables_rolled(GRID, cfg.head_dim)
    x = jnp.ones((1, L, DIM), jnp.float32) * 0.1
    ctx = jnp.ones((1, 512, DIM), jnp.bfloat16) * 0.1
    e6 = jnp.ones((1, 6, DIM), jnp.float32) * 0.1
    params = blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos, sin)

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    # K chained applications amortize dispatch; same-params scan (weights
    # resident) isolates the per-block compute at 14B dims. K kept small:
    # the no-remat backward saves ~2 GB of residuals per iteration
    K = 2

    @jax.jit
    def fwdK(p, x):
        def body(x, _):
            return blk.apply(p, x, e6, ctx, cos, sin).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(x)

    t_f = (timeit("fwdK", fwdK, params, x) - rt) / K

    def make_gradK(policy):
        @jax.jit
        def gradK(p, x):
            # remat per block like the real training step: without it the
            # saved residuals OOM a 16 GB chip
            def loss(p):
                def body(x, _):
                    f = lambda x: blk.apply(p, x, e6, ctx, cos, sin
                                            ).astype(x.dtype)
                    return jax.checkpoint(f, policy=policy)(x), None
                y, _ = jax.lax.scan(body, x, None, length=K)
                return jnp.sum(y)
            return jax.tree.leaves(jax.grad(loss)(p))[0].ravel()[0]
        return gradK

    t_fb = (timeit("grad_fwdbwdK_full", make_gradK(None), params, x) - rt) / K
    t_fb_attn = (timeit(
        "grad_fwdbwdK_attn",
        make_gradK(wan_dit._attn_saveable_policy), params, x) - rt) / K

    fl = block_flops(L)
    print(json.dumps({
        "tokens": L,
        "block_fwd_ms": round(t_f * 1000, 2),
        "block_fwd_tflops": round(fl / t_f / 1e12, 1),
        "block_fwdbwd_ms": round(t_fb * 1000, 2),
        "block_fwdbwd_tflops": round(3 * fl / t_fb / 1e12, 1),
        "block_fwdbwd_attn_ms": round(t_fb_attn * 1000, 2),
        "block_fwdbwd_attn_tflops": round(3 * fl / t_fb_attn / 1e12, 1),
        "full_40block_fwd_ms_est": round(40 * t_f * 1000, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
