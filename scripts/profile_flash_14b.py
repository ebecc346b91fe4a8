"""Flash kernel in isolation at the 14B training shapes.

Shapes: 40 heads x d=128 at 18,900 tokens (720p x 81f Ulysses sp=4 shard)
and 75,600 tokens (unsharded serving length). Round-2 baseline: 117 TF/s
@18.9k, 131-136 @75.6k. Round-3 kernel changes under test: exp2 softmax
with folded log2e scale, pad-minimizing streaming block_k (8.4% -> 1.6%
padding at 18.9k), and the pad mask branched to the last k block only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.ops import flash_attention as fa

HEADS, D = 40, 128
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


def run(L, do_bwd=True):
    q = jax.random.normal(jax.random.PRNGKey(0), (1, L, HEADS, D),
                          jnp.bfloat16) * 0.1
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    @jax.jit
    def fwdK(q):
        def body(q, _):
            return fa.flash_attention(q, q, q, bounded_logits=True).astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(q.astype(jnp.float32))

    t_f = (timeit(f"flash_fwd_{L}", fwdK, q) - rt) / K
    fl = 4.0 * L * L * HEADS * D
    out = {"tokens": L, "fwd_ms": round(t_f * 1000, 2),
           "fwd_tflops": round(fl / t_f / 1e12, 1)}

    if do_bwd:
        @jax.jit
        def gradK(q):
            def loss(q):
                def body(q, _):
                    f = lambda q: fa.flash_attention(q, q, q, bounded_logits=True).astype(q.dtype)
                    return jax.checkpoint(f)(q), None
                y, _ = jax.lax.scan(body, q, None, length=K)
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(loss)(q).ravel()[0]

        t_g = (timeit(f"flash_fwdbwd_{L}", gradK, q) - rt) / K
        out["fwdbwd_ms"] = round(t_g * 1000, 2)
        # fwd+bwd+remat-fwd = 4x fwd FLOPs (bwd is 2 kernels ~2x, + recompute)
        out["fwdbwd_tflops_3x"] = round(3 * fl / t_g / 1e12, 1)
    print(json.dumps(out), flush=True)


def main():
    run(18900, do_bwd=True)
    run(75600, do_bwd=True)


if __name__ == "__main__":
    main()
