"""Flash attention at the 14B target sequence length (75.6k tokens) on one
chip: fwd and fwd+bwd rates with the auto-picked blocks."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.ops import flash_attention as fa

L, N, D = 75600, 2, 128  # 2 heads fit one chip's HBM comfortably


def timeit(tag, fn, *args, n=2):
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
    print(json.dumps({"blocks": fa.pick_blocks(L, L)}), flush=True)
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    q = jnp.ones((1, L, N, D), jnp.bfloat16) * 0.02

    @jax.jit
    def fwd2(q, k, v):
        def body(q, _):
            return fa.flash_attention(q, k, v, bounded_logits=True), None
        q, _ = jax.lax.scan(body, q, None, length=2)
        return jnp.sum(q.astype(jnp.float32))

    t_f = timeit("fwd2_75k", fwd2, q, q, q)

    @jax.jit
    def fwdbwd(q, k, v):
        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, bounded_logits=True).astype(jnp.float32) ** 2)
        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return jnp.sum((gq + gk + gv).astype(jnp.float32))

    t_b = timeit("fwdbwd_75k", fwdbwd, q, q, q)

    fwd_flops = 2 * 4.0 * L * L * D * N
    bwd_flops = (4 + 10) * 1.0 * L * L * D * N  # fwd + dq + dkv
    print(json.dumps({
        "fwd_per_iter_s": round((t_f - rt) / 2, 3),
        "fwd_tflops": round(fwd_flops / (t_f - rt) / 1e12, 1),
        "fwdbwd_s": round(t_b - rt, 3),
        "fwdbwd_tflops": round(bwd_flops / (t_b - rt) / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
