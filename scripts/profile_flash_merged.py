"""A/B the single-pass merged flash backward (FLASH_MERGED_BWD) on the
real chip at the hot 14B shapes. The split dq/dkv kernels execute 7
matmuls per (q, k) cell at ~90% of MXU peak; the merged kernel executes
the algorithmic minimum 5 — expected ~5/7 backward time if the HBM dq
read-modify-write pipeline holds up. Sweeps the merged block_k cap.
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

    results = {}
    for heads, L in ((10, 75600), (40, 18900), (10, 3120)):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, L, heads, 128),
                              jnp.bfloat16) * 0.1
        fl = 4.0 * L * L * heads * 128

        variants = [("split", False, None)]
        for bk in (768, 1024, 1536):
            variants.append((f"merged_bk{bk}", True, str(bk)))
        for tag0, merged, bk_env in variants:
            fa.FLASH_MERGED_BWD = merged
            if bk_env is not None:
                os.environ["HYV_FLASH_MERGED_BK"] = bk_env
            tag = f"h{heads}_L{L}_{tag0}"

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
            results[tag] = {"fwdbwd_ms": round(t_g * 1e3, 1),
                            "fwdbwd_tflops": round(3.5 * fl / t_g / 1e12, 1)}

        # numerics on-chip: merged vs split grads at this shape
        os.environ["HYV_FLASH_MERGED_BK"] = "1024"
        small = q[:, : min(L, 8192)]

        def g(merged):
            fa.FLASH_MERGED_BWD = merged
            return jax.grad(lambda x: jnp.sum(
                fa.flash_attention(x, x, x).astype(jnp.float32) ** 2
            ))(small)

        d = jnp.max(jnp.abs(g(True).astype(jnp.float32) -
                            g(False).astype(jnp.float32)))
        results[f"h{heads}_L{L}_grad_maxdiff"] = float(d)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
