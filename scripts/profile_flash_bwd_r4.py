"""Round-4 merged-backward geometry re-sweep under the BOUNDED forward
(VERDICT r3 item 5).

The merged backward streams q/do/dq(f32 r+w) once per k-block sweep:
HBM bytes ~= bn * lq * n_k * (2+2+8) * d. At 75,776 padded keys the
round-3d cap (bk 1024 via HYV_FLASH_MERGED_BK=1280) gives n_k=74; the
128-multiple divisors of 75,776 = 128*592 allow bk 2048 (n_k=37, halves
the streaming) and 4736 (n_k=16) if the four [BQ, BK] fp32 temporaries
still fit scoped VMEM — which forces bq down (4*bq*bk*4B <= ~14 MB).

Sweeps (bq_cap, bk_cap) pairs at the two hot 14B shapes with
bounded_logits=True (the qk-normed call sites' mode) and the attn remat
policy, exactly as estimate_14b_step.py measures them. Timing per
CLAUDE.md: on-device chained scan, scalar fetch, min of 3.
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
from hyvideo_prfl_tpu.models import wan_dit

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

    # (bq_cap, bk_cap): baseline r3d = (512, 1280) -> bq 512 / bk 1024 at
    # 75.8k keys; candidates raise bk to the next 128-multiple divisors
    geoms = [(512, 1280), (256, 2048), (128, 2048), (128, 4736)]
    results = {}
    for heads, L in ((10, 75600), (40, 18900)):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, L, heads, 128),
                              jnp.bfloat16) * 0.1
        fl = 4.0 * L * L * heads * 128  # fwd; fwd+bwd counts 3.5x

        for bq_cap, bk_cap in geoms:
            os.environ["HYV_FLASH_MERGED_BQ"] = str(bq_cap)
            os.environ["HYV_FLASH_MERGED_BK"] = str(bk_cap)
            tag = f"h{heads}_L{L}_bq{bq_cap}_bk{bk_cap}"

            @jax.jit
            def gradK(q):
                def loss(q):
                    def body(q, _):
                        f = lambda q: fa.flash_attention(
                            q, q, q, bounded_logits=True).astype(q.dtype)
                        return jax.checkpoint(
                            f, policy=wan_dit._attn_saveable_policy)(q), None
                    y, _ = jax.lax.scan(body, q, None, length=K)
                    return jnp.sum(y.astype(jnp.float32))
                return jax.grad(loss)(q).ravel()[0]

            try:
                t = (timeit(tag, gradK, q) - rt) / K
            except Exception as e:  # VMEM overflow etc.: record and move on
                print(json.dumps({"tag": tag,
                                  "error": str(e)[:200]}), flush=True)
                continue
            tfs = 3.5 * fl / t / 1e12
            results[tag] = {"s": round(t, 4), "tflops": round(tfs, 1)}
            print(json.dumps({"tag": tag, "fwd_bwd_s": round(t, 4),
                              "tflops": round(tfs, 1)}), flush=True)

    print(json.dumps({"results": results}, indent=2), flush=True)


if __name__ == "__main__":
    main()
