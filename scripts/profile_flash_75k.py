"""Flash block-geometry sweep at the TRUE Ulysses per-device shape
(10 heads x 75,600 tokens, d=128) — the hot shape of 14B 720p training.

At this length the k/v re-streaming is ~5.7 GB/head per forward
(n_q=148 q blocks x 75.6k keys); larger q blocks cut it linearly, larger
k blocks cut the bwd's q/do re-streaming. VMEM bounds the [BQ, BK] fp32
temporaries (~16 MB scoped)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.ops import flash_attention as fa
from hyvideo_prfl_tpu.models import wan_dit

H, D, L = 10, 128, 75600
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
    q = jax.random.normal(jax.random.PRNGKey(0), (1, L, H, D),
                          jnp.bfloat16) * 0.1
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))
    fl = 4.0 * L * L * H * D

    results = {}
    for bq, bk in ((512, 2048), (768, 2048), (1024, 1024), (512, 3072),
                   (256, 4096)):
        tag = f"bq{bq}_bk{bk}"
        try:
            @jax.jit
            def fwdK(q, bq=bq, bk=bk):
                def body(q, _):
                    o = fa.flash_attention(q, q, q, block_q=bq, block_k=bk, bounded_logits=True)
                    return o.astype(q.dtype), None
                q, _ = jax.lax.scan(body, q, None, length=K)
                return jnp.sum(q.astype(jnp.float32))

            t_f = (timeit(f"{tag}_fwd", fwdK, q) - rt) / K
            results[tag] = {"fwd_ms": round(t_f * 1e3, 1),
                            "fwd_tflops": round(fl / t_f / 1e12, 1)}
        except Exception as e:
            results[tag] = {"error": str(e)[:120]}
            print(json.dumps({"tag": tag, "error": str(e)[:200]}),
                  flush=True)

    # bwd block-cap sweep at the default fwd geometry; blocks must divide
    # the padded length 75776 = 2^11 * 37, so candidates are powers of two
    for bwd_bq, bwd_bk in ((512, 1024), (512, 2048), (256, 2048)):
        tag = f"bwd_{bwd_bq}x{bwd_bk}"
        old = fa._bwd_blocks
        fa._bwd_blocks = (lambda lq_p, lk_p, q0, k0, _bq=bwd_bq,
                          _bk=bwd_bk: (_bq, _bk))
        try:
            @jax.jit
            def gradK(q):
                def loss(q):
                    def body(q, _):
                        f = lambda q: fa.flash_attention(q, q, q, bounded_logits=True).astype(
                            q.dtype)
                        return jax.checkpoint(
                            f, policy=wan_dit._attn_saveable_policy)(q), None
                    y, _ = jax.lax.scan(body, q, None, length=K)
                    return jnp.sum(y.astype(jnp.float32))
                return jax.grad(loss)(q).ravel()[0]

            t_g = (timeit(f"{tag}_fwdbwd", gradK, q) - rt) / K
            results[tag] = {"fwdbwd_ms": round(t_g * 1e3, 1)}
        except Exception as e:
            results[tag] = {"error": str(e)[:120]}
            print(json.dumps({"tag": tag, "error": str(e)[:200]}),
                  flush=True)
        finally:
            fa._bwd_blocks = old

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
