"""Feasibility probe: int8 matmul INSIDE a Pallas/Mosaic kernel on this chip.

The int8 dense serving path (ops/quant.py) runs its int8 dots through XLA
(lax.dot_general s8xs8->s32, 350 TOPS measured). Extending W8A8 to the
flash-attention kernel requires Mosaic to lower an in-kernel int8 dot.
This probe answers, on the real chip:
  1. does jnp.dot(s8, s8, preferred_element_type=s32) lower inside pallas_call?
  2. at what rate vs the same kernel's bf16 dot (MXU int8 is 2x bf16 on v5e)?
  3. does dot_general with s8 inputs + f32 preferred accumulate work?
Results decide whether an int8 qk^T / pv flash variant is worth building.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


M = N = K_DIM = 512
STEPS = 64  # chain dots inside the kernel to amortize overheads


def _kern_int8(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros((M, N), jnp.int32)
    for _ in range(STEPS):
        acc += jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    o_ref[...] = acc


def _kern_bf16(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros((M, N), jnp.float32)
    for _ in range(STEPS):
        acc += jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc


def run(name, kern, dtype, out_dtype):
    a = (jax.random.normal(jax.random.PRNGKey(0), (M, K_DIM)) * 10)
    b = (jax.random.normal(jax.random.PRNGKey(1), (K_DIM, N)) * 10)
    a = a.astype(dtype)
    b = b.astype(dtype)
    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype))

    @jax.jit
    def chained(a, b):
        o = fn(a, b)
        return jnp.sum(o.astype(jnp.float32))

    try:
        t0 = time.perf_counter()
        s = float(chained(a, b))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(chained(a, b))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        flops = 2.0 * M * N * K_DIM * STEPS
        print(json.dumps({"probe": name, "ok": True,
                          "best_s": round(best, 5),
                          "tops": round(flops / best / 1e12, 1),
                          "compile_s": round(compile_s, 1),
                          "checksum": s}), flush=True)
        return best
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "ok": False,
                          "err": f"{type(e).__name__}: {str(e)[:400]}"}),
              flush=True)
        return None


def main():
    # reference rate: same chain through plain XLA jit (no pallas)
    a8 = (jax.random.normal(jax.random.PRNGKey(0), (M, K_DIM)) * 10
          ).astype(jnp.int8)
    b8 = (jax.random.normal(jax.random.PRNGKey(1), (K_DIM, N)) * 10
          ).astype(jnp.int8)

    @jax.jit
    def xla_chain(a, b):
        acc = jnp.zeros((M, N), jnp.int32)
        for _ in range(STEPS):
            acc += jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return jnp.sum(acc)

    t0 = time.perf_counter()
    float(xla_chain(a8, b8))
    print(json.dumps({"probe": "xla_int8", "compile_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(xla_chain(a8, b8))
        ts.append(time.perf_counter() - t0)
    flops = 2.0 * M * N * K_DIM * STEPS
    print(json.dumps({"probe": "xla_int8", "ok": True,
                      "tops": round(flops / min(ts) / 1e12, 1)}), flush=True)

    run("pallas_bf16", _kern_bf16, jnp.bfloat16, jnp.float32)
    run("pallas_int8", _kern_int8, jnp.int8, jnp.int32)


if __name__ == "__main__":
    main()
