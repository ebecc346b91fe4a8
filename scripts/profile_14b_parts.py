"""Submodule decomposition of the 14B-dimension block at the per-device
720p Ulysses shard (18,900 tokens): where do the block's 157 ms go?
(scripts/profile_14b_block.py measures the composite; this isolates
self-attention, cross-attention and FFN at dim 5120.)"""

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
from hyvideo_prfl_tpu.ops import flash_attention as fa

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
    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=1, remat=False)
    cos, sin = rope_tables_rolled(GRID, cfg.head_dim)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, L, DIM), jnp.bfloat16) * 0.1
    ctx = jnp.ones((1, 512, DIM), jnp.bfloat16) * 0.1

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    sa = wan_dit.SelfAttention(cfg)
    sa_p = sa.init(rng, x, cos, sin)

    @jax.jit
    def selfK(p, x):
        def body(x, _):
            return sa.apply(p, x, cos, sin).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(x.astype(jnp.float32))

    t_self = (timeit("selfK", selfK, sa_p, x) - rt) / K

    ca = wan_dit.CrossAttention(cfg)
    ca_p = ca.init(rng, x, ctx)

    @jax.jit
    def crossK(p, x):
        def body(x, _):
            return ca.apply(p, x, ctx).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(x.astype(jnp.float32))

    t_cross = (timeit("crossK", crossK, ca_p, x) - rt) / K

    # flash kernel alone at this shape (40 heads x 18,900 x 128)
    q = jnp.ones((1, L, HEADS, cfg.head_dim), jnp.bfloat16) * 0.1

    @jax.jit
    def flashK(q):
        def body(q, _):
            o = fa.flash_attention(q, q, q, bounded_logits=True)
            return o.astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(q.astype(jnp.float32))

    t_flash = (timeit("flashK", flashK, q) - rt) / K
    attn_fl = 4.0 * L * L * DIM

    # FFN alone
    import flax.linen as nn

    class Ffn(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.Dense(FFN, dtype=jnp.bfloat16,
                         param_dtype=jnp.float32)(h)
            h = nn.gelu(h, approximate=True)
            return nn.Dense(DIM, dtype=jnp.bfloat16,
                            param_dtype=jnp.float32)(h)

    ffn = Ffn()
    ffn_p = ffn.init(rng, x)

    @jax.jit
    def ffnK(p, x):
        def body(x, _):
            return ffn.apply(p, x).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(x.astype(jnp.float32))

    t_ffn = (timeit("ffnK", ffnK, ffn_p, x) - rt) / K
    ffn_fl = 2.0 * 2 * DIM * FFN * L

    print(json.dumps({
        "self_ms": round(t_self * 1000, 1),
        "cross_ms": round(t_cross * 1000, 1),
        "flash_ms": round(t_flash * 1000, 1),
        "flash_tflops": round(attn_fl / t_flash / 1e12, 1),
        "ffn_ms": round(t_ffn * 1000, 1),
        "ffn_tflops": round(ffn_fl / t_ffn / 1e12, 1),
        "qkvo_dense_ms_est": round((t_self - t_flash) * 1000, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
