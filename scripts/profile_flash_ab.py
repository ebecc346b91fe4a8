"""A/B the round-3 flash-kernel changes in ONE process at 18,900 tokens:
exp vs exp2 softmax x block_k 2048 (round-2) vs 1920 (pad-minimized).
The lax.cond last-block mask already measured as a 117 -> 74 TF/s loss
and was reverted; this isolates the remaining two changes."""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.ops import flash_attention as fa

HEADS, D, L = 40, 128, 18900
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
    q = jax.random.normal(jax.random.PRNGKey(0), (1, L, HEADS, D),
                          jnp.bfloat16) * 0.1
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))
    fl = 4.0 * L * L * HEADS * D

    results = {}
    for exp2, bk in itertools.product((False, True), (2048, 1920)):
        fa.FLASH_EXP2 = exp2
        tag = f"{'exp2' if exp2 else 'exp'}_bk{bk}"

        @jax.jit
        def fwdK(q, bk=bk):
            def body(q, _):
                o = fa.flash_attention(q, q, q, block_k=bk, bounded_logits=True)
                return o.astype(q.dtype), None
            q, _ = jax.lax.scan(body, q, None, length=K)
            return jnp.sum(q.astype(jnp.float32))

        t_f = (timeit(f"{tag}_fwd", fwdK, q) - rt) / K

        @jax.jit
        def gradK(q, bk=bk):
            def loss(q):
                def body(q, _):
                    f = lambda q: fa.flash_attention(
                        q, q, q, block_k=bk).astype(q.dtype)
                    return jax.checkpoint(f)(q), None
                y, _ = jax.lax.scan(body, q, None, length=K)
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(loss)(q).ravel()[0]

        t_g = (timeit(f"{tag}_fwdbwd", gradK, q) - rt) / K
        results[tag] = {
            "fwd_ms": round(t_f * 1e3, 1),
            "fwd_tflops": round(fl / t_f / 1e12, 1),
            "fwdbwd_ms": round(t_g * 1e3, 1),
        }
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
