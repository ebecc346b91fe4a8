"""Real-chip A/B of the int8 qk^T serving forward vs the bf16 bounded one.

Shapes: the 14B uly8 serving shard (5 heads @ 75,600 tokens, batch-2 CFG)
and the sp=4 shard (10 heads @ 75,600). Reports time, TF/s on the useful
(bf16-equivalent) FLOPs, and max|diff| vs the bf16 bounded kernel.
Rate context: probe_int8_rate.py measured the int8 MXU at 329 TOPS on the
qk tile (1.84x bf16), so the kernel's MXU floor drops ~25% (the pv matmul
stays bf16); the quantize pass adds ~2 HBM sweeps over q/k (~1 ms).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hyvideo_prfl_tpu.ops import flash_attention as fa

K = 2


def bench(tag, heads, length, batch, rt, qk_int8):
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, length, heads, 128),
                          jnp.bfloat16) * 0.1
    k = jax.random.normal(jax.random.PRNGKey(1), (batch, length, heads, 128),
                          jnp.bfloat16) * 0.1
    v = jax.random.normal(jax.random.PRNGKey(2), (batch, length, heads, 128),
                          jnp.bfloat16)

    @jax.jit
    def fwdK(q, k, v):
        def body(q, _):
            o = fa.flash_attention(q, k, v, bounded_logits=True,
                                   qk_int8=qk_int8)
            return o.astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(q.astype(jnp.float32))

    t0 = time.perf_counter()
    float(fwdK(q, k, v))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwdK(q, k, v))
        ts.append(time.perf_counter() - t0)
    best = (min(ts) - rt) / K
    flops = 4.0 * batch * heads * length * length * 128
    print(json.dumps({"tag": tag, "ms": round(best * 1e3, 1),
                      "tflops": round(flops / best / 1e12, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)

    # one-shot numerics check vs the bf16 bounded path
    if qk_int8:
        o_ref = fa.flash_attention(q[:1, :4096], k[:1, :4096], v[:1, :4096],
                                   bounded_logits=True)
        o_int8 = fa.flash_attention(q[:1, :4096], k[:1, :4096], v[:1, :4096],
                                    bounded_logits=True, qk_int8=True)
        d = jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                            - o_int8.astype(jnp.float32)))
        print(json.dumps({"tag": tag + "_maxdiff", "v": float(d)}),
              flush=True)
    return best


def main():
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    float(trivial(jnp.zeros((8, 128))))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(jnp.zeros((8, 128))))
        ts.append(time.perf_counter() - t0)
    rt = min(ts)
    print(json.dumps({"roundtrip_s": round(rt, 4)}), flush=True)

    for heads, length, batch in ((5, 75600, 2), (10, 75600, 1)):
        t_bf = bench(f"bf16_{heads}h_{length}_b{batch}", heads, length,
                     batch, rt, False)
        t_i8 = bench(f"int8_{heads}h_{length}_b{batch}", heads, length,
                     batch, rt, True)
        print(json.dumps({"tag": f"speedup_{heads}h_b{batch}",
                          "x": round(t_bf / t_i8, 3)}), flush=True)


if __name__ == "__main__":
    main()
