"""In-kernel int8 vs bf16 MXU rate at flash-attention tile shapes.

probe_int8_mosaic.py proved Mosaic lowers s8 x s8 -> s32 dot_general inside
pallas_call; this measures the achieved rate. Grid (R, N) with N distinct
b-blocks (no loop-invariant dot to hoist) accumulating into one revisited
output block; two shapes:
  - big-K: a[512, 1024] x b[1024, 2048]   (dense-like)
  - qk^T:  a[512, 128]  x b[128, 2048]    (flash tile: K = head_dim)
Decides whether an int8 qk^T path in the flash kernel can approach the
v5e's 394 TOPS int8 peak (2x the 197 TF/s bf16 peak).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def make(m, k, n_cols, reps, nblocks, in_dtype, acc_dtype):
    def kern(a_ref, b_ref, o_ref):
        r, nb = pl.program_id(0), pl.program_id(1)

        @pl.when((r == 0) & (nb == 0))
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)

    return pl.pallas_call(
        kern,
        grid=(reps, nblocks),
        in_specs=[pl.BlockSpec((m, k), lambda r, nb: (0, 0)),
                  pl.BlockSpec((k, n_cols), lambda r, nb: (0, nb))],
        out_specs=pl.BlockSpec((m, n_cols), lambda r, nb: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n_cols), acc_dtype))


def run(tag, m, k, n_cols, reps, nblocks, in_dtype, acc_dtype, rt):
    a = (jax.random.normal(jax.random.PRNGKey(0), (m, k)) * 5).astype(in_dtype)
    b = (jax.random.normal(jax.random.PRNGKey(1), (k, n_cols * nblocks)) * 5
         ).astype(in_dtype)
    fn = make(m, k, n_cols, reps, nblocks, in_dtype, acc_dtype)

    @jax.jit
    def go(a, b):
        return jnp.sum(fn(a, b).astype(jnp.float32))

    t0 = time.perf_counter()
    float(go(a, b))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(go(a, b))
        ts.append(time.perf_counter() - t0)
    best = min(ts) - rt
    flops = 2.0 * m * k * n_cols * reps * nblocks
    print(json.dumps({"probe": tag, "s": round(best, 4),
                      "tops": round(flops / best / 1e12, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    trivial = jax.jit(lambda x: jnp.sum(x) + 1.0)
    t0 = time.perf_counter()
    float(trivial(jnp.zeros((8, 128))))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(jnp.zeros((8, 128))))
        ts.append(time.perf_counter() - t0)
    rt = min(ts)
    print(json.dumps({"roundtrip_s": round(rt, 4)}), flush=True)

    # big-K dense-like tile: ~1.76e13 FLOPs per call
    run("bigK_bf16", 512, 1024, 2048, 512, 16, jnp.bfloat16, jnp.float32, rt)
    run("bigK_int8", 512, 1024, 2048, 512, 16, jnp.int8, jnp.int32, rt)
    # flash qk^T tile (K = 128): same total FLOPs
    run("qk_bf16", 512, 128, 2048, 4096, 16, jnp.bfloat16, jnp.float32, rt)
    run("qk_int8", 512, 128, 2048, 4096, 16, jnp.int8, jnp.int32, rt)


if __name__ == "__main__":
    main()
