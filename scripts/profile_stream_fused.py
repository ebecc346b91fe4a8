"""A/B the fused ln_scale_shift Pallas kernel against the unfused XLA
LayerNorm+modulate chain at the 14B Ulysses shard, and re-check the
qk-RMSNorm+rope kernel now that the relaxed block picker lets it engage at
L = 18,900 (no multiple-of-8 divisor exists there; Mosaic masks the ragged
sublane tile instead).

Measures (real chip, scalar-fetch timing per CLAUDE.md):
  * ln_xla / ln_fused:     forward, [1, 18900, 5120] fp32 -> bf16
  * lnbwd_xla / lnbwd_fused: value+grad of sum(LN(x)*s+t) wrt (x, s, t)
  * qk_xla / qk_fused:     rmsnorm_rope fwd at [1, 18900, 40*128]
  * qkbwd_*:               value+grad wrt (x, w)

HYV_PROF_SMALL=1 runs tiny shapes (CPU smoke of the script itself).
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

from hyvideo_prfl_tpu.ops import qknorm_rope as qr
from hyvideo_prfl_tpu.ops import stream
from hyvideo_prfl_tpu.models.rope import rope_tables_rolled

if os.environ.get("HYV_PROF_SMALL") == "1":
    DIM, HEADS = 256, 2
    GRID = (2, 6, 4)
else:
    DIM, HEADS = 5120, 40
    GRID = (21, 45, 20)
L = GRID[0] * GRID[1] * GRID[2]
D = DIM // HEADS
K = 4


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


def scanK(fn):
    @jax.jit
    def run(x, *rest):
        def body(x, _):
            return fn(x, *rest), None
        x, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(x[..., :8].astype(jnp.float32))
    return run


def main():
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))
    res = {"block_l_fwd": stream.pick_block_l(L, DIM),
           "block_l_bwd": stream.pick_block_l(L, DIM, 12),
           "block_l_qk": qr.pick_block_l(L, HEADS, D)}

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, L, DIM) * 0.5, jnp.float32)
    s = jnp.asarray(1.0 + 0.1 * rng.randn(1, DIM), jnp.float32)
    t = jnp.asarray(0.1 * rng.randn(1, DIM), jnp.float32)

    # ---- fused vs XLA LN forward (keeps x-like carry for the scan chain) --
    def ln_xla(x, s, t):
        h = stream._xla_ref(x, s, t, 1e-6, jnp.bfloat16)
        return x * 0.999 + h.astype(jnp.float32) * 1e-3

    def ln_fused(x, s, t):
        h = stream.ln_scale_shift(x, s, t)
        return x * 0.999 + h.astype(jnp.float32) * 1e-3

    a = (timeit("ln_xla", scanK(ln_xla), x, s, t) - rt) / K
    b = (timeit("ln_fused", scanK(ln_fused), x, s, t) - rt) / K
    res["ln_xla_ms"], res["ln_fused_ms"] = round(a * 1e3, 2), round(b * 1e3, 2)

    # numerics: fused vs unfused forward
    got = stream.ln_scale_shift(x, s, t)
    want = stream._xla_ref(x, s, t, 1e-6, jnp.bfloat16)
    res["ln_fwd_maxdiff"] = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))

    # ---- backward -------------------------------------------------------
    def loss_fused(x, s, t):
        h = stream.ln_scale_shift(x, s, t)
        return jnp.sum(h.astype(jnp.float32) * 1e-3)

    def loss_xla(x, s, t):
        h = stream._xla_ref(x, s, t, 1e-6, jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32) * 1e-3)

    def gradK(loss):
        g = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def run(x, s, t):
            def body(c, _):
                dx, ds, dt = g(c, s, t)
                return c + dx * 1e-6, (jnp.sum(ds) + jnp.sum(dt))
            c, aux = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(c[..., :8]) + jnp.sum(aux)
        return run

    a = (timeit("lnbwd_xla", gradK(loss_xla), x, s, t) - rt) / K
    b = (timeit("lnbwd_fused", gradK(loss_fused), x, s, t) - rt) / K
    res["lnbwd_xla_ms"] = round(a * 1e3, 2)
    res["lnbwd_fused_ms"] = round(b * 1e3, 2)

    gx = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, s, t)
    gw = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(x, s, t)
    res["ln_bwd_maxdiff"] = float(max(
        jnp.max(jnp.abs(a_ - b_)) for a_, b_ in zip(gx, gw)))

    # ---- qk-RMSNorm+rope at the previously-fallback length ----------------
    xq = jnp.asarray(rng.randn(1, L, DIM) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.rand(DIM) + 0.5, jnp.float32)
    cos, sin = rope_tables_rolled(GRID, D)

    def qk_fused(xq, w, cos, sin):
        o = qr.rmsnorm_rope(xq, w, cos, sin, HEADS)
        return (xq.astype(jnp.float32) * 0.999
                + jnp.moveaxis(o, 1, 2).reshape(xq.shape).astype(jnp.float32)
                * 1e-3).astype(jnp.bfloat16)

    def qk_xla(xq, w, cos, sin):
        o = qr._xla_ref(xq, w.reshape(HEADS, D), cos, sin, 1e-6, True)
        return (xq.astype(jnp.float32) * 0.999
                + jnp.moveaxis(o, 1, 2).reshape(xq.shape).astype(jnp.float32)
                * 1e-3).astype(jnp.bfloat16)

    a = (timeit("qk_xla", scanK(qk_xla), xq, w, cos, sin) - rt) / K
    b = (timeit("qk_fused", scanK(qk_fused), xq, w, cos, sin) - rt) / K
    res["qk_xla_ms"], res["qk_fused_ms"] = round(a * 1e3, 2), round(b * 1e3, 2)

    got = qr.rmsnorm_rope(xq, w, cos, sin, HEADS)
    want = qr._xla_ref(xq, w.reshape(HEADS, D), cos, sin, 1e-6, True)
    res["qk_fwd_maxdiff"] = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))

    def qloss_fused(xq, w):
        o = qr.rmsnorm_rope(xq, w, cos, sin, HEADS)
        return jnp.sum(o.astype(jnp.float32) * 1e-3)

    def qloss_xla(xq, w):
        o = qr._xla_ref(xq, w.reshape(HEADS, D), cos, sin, 1e-6, True)
        return jnp.sum(o.astype(jnp.float32) * 1e-3)

    def qgradK(loss):
        g = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def run(xq, w):
            def body(c, _):
                dx, dw = g(c, w)
                return (c + dx.astype(c.dtype) * 1e-6), jnp.sum(dw)
            c, aux = jax.lax.scan(body, xq, None, length=K)
            return jnp.sum(c[..., :8].astype(jnp.float32)) + jnp.sum(aux)
        return run

    a = (timeit("qkbwd_xla", qgradK(qloss_xla), xq, w) - rt) / K
    b = (timeit("qkbwd_fused", qgradK(qloss_fused), xq, w) - rt) / K
    res["qkbwd_xla_ms"] = round(a * 1e3, 2)
    res["qkbwd_fused_ms"] = round(b * 1e3, 2)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
