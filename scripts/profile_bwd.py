"""Backward-pass isolation at bench scale: flash VJP, AdamW update, block
grad. One TPU run."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.models.rope import rope_tables_rolled
from hyvideo_prfl_tpu.ops import flash_attention as fa
from hyvideo_prfl_tpu.training import common

DIM, HEADS, D, FFN, LAYERS = 1280, 10, 128, 4480, 24
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
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    # --- flash fwd+bwd chain (12x) ---
    qkv = jnp.ones((1, L, HEADS, D), jnp.bfloat16) * 0.1

    @jax.jit
    def attngrad12(q, k, v):
        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, bounded_logits=True).astype(jnp.float32) ** 2)

        def body(q, _):
            gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return (gq + gk + gv).astype(q.dtype) * 1e-3, None
        q, _ = jax.lax.scan(body, q, None, length=12)
        return jnp.sum(q.astype(jnp.float32))

    t_ag = timeit("attngrad12", attngrad12, qkv, qkv, qkv)

    # --- AdamW update chain (3x) on a 0.6B tree ---
    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=LAYERS)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    tx = common.make_optimizer(learning_rate=1e-6)
    opt0 = tx.init(params)
    grads = jax.tree.map(lambda a: jnp.full_like(a, 1e-6), params)

    @jax.jit
    def opt3(params, opt, grads):
        def body(carry, _):
            p, o = carry
            u, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, u), o), None
        (p, _), _ = jax.lax.scan(body, (params, opt), None, length=3)
        return jnp.sum(p["params"]["head"]["head"]["kernel"])

    t_opt = timeit("adamw3", opt3, params, opt0, grads)

    # --- one WanBlock fwd+bwd (12x), remat-free ---
    blk = wan_dit.WanBlock(cfg)
    cos, sin = rope_tables_rolled(GRID, D)
    x = jnp.ones((1, L, DIM), jnp.float32) * 0.1
    ctx = jnp.ones((1, 512, DIM), jnp.bfloat16) * 0.1
    e6 = jnp.ones((1, 6, DIM), jnp.float32) * 0.1
    bp = blk.init(jax.random.PRNGKey(1), x, e6, ctx, cos, sin)

    @jax.jit
    def blockgrad12(bp, x, e6, ctx, cos, sin):
        def loss(bp, x):
            return jnp.sum(blk.apply(bp, x, e6, ctx, cos, sin) ** 2)

        def body(x, _):
            gp, gx = jax.grad(loss, argnums=(0, 1))(bp, x)
            leaves = [jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(gp)]
            return gx * 1e-3 + 0 * sum(leaves), None
        x, _ = jax.lax.scan(body, x, None, length=12)
        return jnp.sum(x)

    t_bg = timeit("blockgrad12", blockgrad12, bp, x, e6, ctx, cos, sin)

    attn_bwd_flops = 12 * (4 + 2 * 4 + 2) * L * L * D * HEADS  # fwd+dq+dkv
    print(json.dumps({
        "attngrad_per_iter_ms": round((t_ag - rt) / 12 * 1000, 2),
        "attngrad_tflops": round(attn_bwd_flops / (t_ag - rt) / 1e12, 1),
        "adamw_per_update_ms": round((t_opt - rt) / 3 * 1000, 2),
        "blockgrad_per_iter_ms": round((t_bg - rt) / 12 * 1000, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
