"""Real-chip compute cost of head-chunked Ulysses (HYV_ULYSSES_CHUNKS).

On one chip the a2a is absent; what remains is the kernel-side question:
does splitting the per-device flash call (10 heads x 75.6k at the 14B
sp=4 serving/training shard) into C calls of 10/C heads lose MXU
efficiency? If ~0, the chunked sandwich's a2a overlap (see
tests/test_ulysses_chunked.py) is pure win on multi-chip.

Timing per CLAUDE.md: scalar fetch after an on-device scan chain; the
trivial-jit roundtrip is subtracted.
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

B, L, N, D = 2, 75600, 10, 128
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
    return min(ts), compile_s


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, L, N, D),
                          jnp.bfloat16) * 0.1
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt, _ = timeit("roundtrip", trivial, jnp.zeros((8, 128)))
    fl = 4.0 * B * L * L * N * D

    for chunks in (1, 2, 5):
        nc = N // chunks

        @jax.jit
        def fwdK(q, chunks=chunks, nc=nc):
            def body(q, _):
                outs = [
                    fa.flash_attention(q[:, :, i * nc:(i + 1) * nc],
                                       k[:, :, i * nc:(i + 1) * nc],
                                       v[:, :, i * nc:(i + 1) * nc],
                                       bounded_logits=True)
                    for i, (k, v) in enumerate([(q, q)] * chunks)
                ]
                o = jnp.concatenate(outs, axis=2) if chunks > 1 else outs[0]
                return o.astype(q.dtype), None
            q, _ = jax.lax.scan(body, q, None, length=K)
            return jnp.sum(q.astype(jnp.float32))

        best, compile_s = timeit(f"chunks{chunks}", fwdK, q)
        per = (best - rt) / K
        print(json.dumps({
            "chunks": chunks, "fwd_s": round(per, 4),
            "tf_s": round(fl / per / 1e12, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
