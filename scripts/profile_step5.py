"""Submodule ablation at bench scale: where do the non-matmul ms go?"""

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

DIM, HEADS, FFN, LAYERS = 1280, 10, 4480, 24
GRID = (8, 15, 26)
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


def main():
    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=LAYERS, remat=False)
    cos, sin = rope_tables_rolled(GRID, cfg.head_dim)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, L, DIM), jnp.bfloat16)
    ctx = jnp.ones((1, 512, DIM), jnp.bfloat16)
    e6 = jnp.ones((1, 6, DIM), jnp.float32)

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    sa = wan_dit.SelfAttention(cfg)
    sa_p = sa.init(rng, x, cos, sin)

    @jax.jit
    def self24(p, x, cos, sin):
        def body(x, _):
            return sa.apply(p, x, cos, sin).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=24)
        return jnp.sum(x.astype(jnp.float32))

    t_self = timeit("self24", self24, sa_p, x, cos, sin)

    ca = wan_dit.CrossAttention(cfg)
    ca_p = ca.init(rng, x, ctx)

    @jax.jit
    def cross24(p, x, ctx):
        def body(x, _):
            return ca.apply(p, x, ctx).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=24)
        return jnp.sum(x.astype(jnp.float32))

    t_cross = timeit("cross24", cross24, ca_p, x, ctx)

    blk = wan_dit.WanBlock(cfg)
    blk_p = blk.init(rng, x, e6, ctx, cos, sin)

    @jax.jit
    def block24(p, x, e6, ctx, cos, sin):
        def body(x, _):
            return blk.apply(p, x, e6, ctx, cos, sin).astype(jnp.float32), None
        x, _ = jax.lax.scan(body, x, None, length=24)
        return jnp.sum(x)

    t_block = timeit("block24", block24, blk_p, x.astype(jnp.float32), e6,
                     ctx, cos, sin)

    params = wan_dit.init_params(cfg, rng)
    model = wan_dit.WanModel(cfg)
    f, h, w = GRID[0], GRID[1] * 2, GRID[2] * 2
    xv = jnp.zeros((1, f, h, w, 16), jnp.float32)
    t = jnp.ones((1,), jnp.float32) * 500
    ctx_t5 = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)

    @jax.jit
    def fwd4(params, x, t, ctx):
        def body(x, _):
            return model.apply(params, x, t, ctx), None
        x, _ = jax.lax.scan(body, x, None, length=4)
        return jnp.sum(x)

    t_fwd = timeit("fwd4_noremat", fwd4, params, xv, t, ctx_t5)

    print(json.dumps({
        "self_per_block_ms": round((t_self - rt) / 24 * 1000, 3),
        "cross_per_block_ms": round((t_cross - rt) / 24 * 1000, 3),
        "block_per_block_ms": round((t_block - rt) / 24 * 1000, 3),
        "fwd_noremat_ms": round((t_fwd - rt) / 4 * 1000, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
