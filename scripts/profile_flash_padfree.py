"""A/B the mask-free static-padding flash path (FLASH_PADFREE) on the real
chip at the two hot 14B shapes:

* 40 heads x 18,900 tokens (the per-device local block length under sp=4)
* 10 heads x 75,600 tokens (the true Ulysses attention shape)

Both run masked="pad" today (75,600 pads to 75,776 at bk 2048; 18,900 to
19,200 at bk 1920), paying ~3 iota/cmp/select VPU passes over every
[BQ, BK] tile. Padfree replaces that with one [BQ,1] correction at finish
(forward) and nothing at all (backward) — exact math, see
ops/flash_attention.py FLASH_PADFREE.
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
    for heads, L in ((10, 75600), (40, 18900)):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, L, heads, 128),
                              jnp.bfloat16) * 0.1
        fl = 4.0 * L * L * heads * 128
        for padfree in (False, True):
            fa.FLASH_PADFREE = padfree
            tag = f"h{heads}_L{L}_{'padfree' if padfree else 'pad'}"

            @jax.jit
            def fwdK(q):
                def body(q, _):
                    o = fa.flash_attention(q, q, q, bounded_logits=True)
                    return o.astype(q.dtype), None
                q, _ = jax.lax.scan(body, q, None, length=K)
                return jnp.sum(q.astype(jnp.float32))

            t_f = (timeit(f"{tag}_fwd", fwdK, q) - rt) / K
            ent = {"fwd_ms": round(t_f * 1e3, 1),
                   "fwd_tflops": round(fl / t_f / 1e12, 1)}

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
            ent["fwdbwd_ms"] = round(t_g * 1e3, 1)
            ent["fwdbwd_tflops"] = round(3.5 * fl / t_g / 1e12, 1)
            results[tag] = ent

        # numerics: padfree vs masked on-chip at this shape (small slice)
        fa.FLASH_PADFREE = True
        o_new = fa.flash_attention(q[:, :4096], q, q, bounded_logits=True)
        fa.FLASH_PADFREE = False
        o_old = fa.flash_attention(q[:, :4096], q, q, bounded_logits=True)
        results[f"h{heads}_L{L}_maxdiff"] = float(
            jnp.max(jnp.abs(o_new.astype(jnp.float32) -
                            o_old.astype(jnp.float32))))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
