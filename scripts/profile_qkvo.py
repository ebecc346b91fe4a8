"""Measure the self-attention qkv/o dense-chain variants at the 14B shape.

Round-2 decomposition (STATUS.md): at dim 5120 / 18,900 tokens the self-attn
qkv/o dense chain runs ~116 TF/s while the ffn proves 175 TF/s is reachable.
Suspects: 3 separate [D,D] matmuls instead of one [D,3D]; the flash output
relayout (BNLD -> BLND moveaxis) feeding the o projection; the v moveaxis
into the kernel. This measures each fix in isolation and composed:

  v0  baseline: q/k/v separate matmuls + rmsnorm_rope + flash + moveaxis + o
  v1  fused qkv [D, 3D] single matmul, rest as v0
  v2  o-proj as einsum('bnld,ndm->blm') on the head-major flash output
  v3  v1 + v2
Each is timed fwd-only and fwd+bwd (grad wrt weights and x).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models.rope import rope_tables_rolled
from hyvideo_prfl_tpu.ops.qknorm_rope import rmsnorm_rope
from hyvideo_prfl_tpu.ops.flash_attention import flash_attention

DIM, HEADS, D = 5120, 40, 128
GRID = (21, 45, 20)
L = GRID[0] * GRID[1] * GRID[2]
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
    cos, sin = rope_tables_rolled(GRID, D)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (1, L, DIM), jnp.bfloat16) * 0.02
    wq = jax.random.normal(ks[1], (DIM, DIM), jnp.bfloat16) * 0.02
    wk = jax.random.normal(ks[2], (DIM, DIM), jnp.bfloat16) * 0.02
    wv = jax.random.normal(ks[3], (DIM, DIM), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[4], (DIM, DIM), jnp.bfloat16) * 0.02
    bq = jnp.zeros((DIM,), jnp.bfloat16)
    bk = jnp.zeros((DIM,), jnp.bfloat16)
    bv = jnp.zeros((DIM,), jnp.bfloat16)
    bo = jnp.zeros((DIM,), jnp.bfloat16)
    nq = jnp.ones((DIM,), jnp.float32)
    nk = jnp.ones((DIM,), jnp.float32)
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # [D, 3D]
    bqkv = jnp.concatenate([bq, bk, bv])

    def attn(q, k, v):
        # q,k head-major from the norm kernel; v token-major
        return flash_attention(q, k, v, qk_layout="bnld",
                               bounded_logits=True)  # [B, L, N, D]

    def v0(p, x):
        wq, wk, wv, wo, bq, bk, bv, bo, nq_, nk_ = p
        q = x @ wq + bq
        k = x @ wk + bk
        v = (x @ wv + bv).reshape(1, L, HEADS, D)
        qh = rmsnorm_rope(q, nq_, cos, sin, HEADS)
        kh = rmsnorm_rope(k, nk_, cos, sin, HEADS)
        o = attn(qh, kh, v).reshape(1, L, DIM)
        return o @ wo + bo

    def v1(p, x):
        wqkv, wo, bqkv, bo, nq_, nk_ = p
        qkv = x @ wqkv + bqkv
        q, k, v = qkv[..., :DIM], qkv[..., DIM:2 * DIM], qkv[..., 2 * DIM:]
        v = v.reshape(1, L, HEADS, D)
        qh = rmsnorm_rope(q, nq_, cos, sin, HEADS)
        kh = rmsnorm_rope(k, nk_, cos, sin, HEADS)
        o = attn(qh, kh, v).reshape(1, L, DIM)
        return o @ wo + bo

    def v2(p, x):
        wq, wk, wv, wo, bq, bk, bv, bo, nq_, nk_ = p
        q = x @ wq + bq
        k = x @ wk + bk
        v = (x @ wv + bv).reshape(1, L, HEADS, D)
        qh = rmsnorm_rope(q, nq_, cos, sin, HEADS)
        kh = rmsnorm_rope(k, nk_, cos, sin, HEADS)
        ob = attn(qh, kh, v)  # [B, L, N, D]
        ob = jnp.moveaxis(ob, 2, 1)  # back to BNLD: simulate kernel-native
        wo3 = wo.reshape(HEADS, D, DIM)
        return jnp.einsum("bnld,ndm->blm", ob, wo3) + bo

    def v3(p, x):
        wqkv, wo, bqkv, bo, nq_, nk_ = p
        qkv = x @ wqkv + bqkv
        q, k, v = qkv[..., :DIM], qkv[..., DIM:2 * DIM], qkv[..., 2 * DIM:]
        v = v.reshape(1, L, HEADS, D)
        qh = rmsnorm_rope(q, nq_, cos, sin, HEADS)
        kh = rmsnorm_rope(k, nk_, cos, sin, HEADS)
        ob = attn(qh, kh, v)
        ob = jnp.moveaxis(ob, 2, 1)
        wo3 = wo.reshape(HEADS, D, DIM)
        return jnp.einsum("bnld,ndm->blm", ob, wo3) + bo

    p_sep = (wq, wk, wv, wo, bq, bk, bv, bo, nq, nk)
    p_fus = (wqkv, wo, bqkv, bo, nq, nk)

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    results = {}
    for tag, fn, p in (("v0_sep", v0, p_sep), ("v1_qkv", v1, p_fus),
                       ("v2_oproj", v2, p_sep), ("v3_both", v3, p_fus)):
        @jax.jit
        def fwdK(p, x, fn=fn):
            def body(x, _):
                return fn(p, x).astype(x.dtype), None
            x, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(x.astype(jnp.float32))

        t_f = (timeit(f"{tag}_fwd", fwdK, p, x) - rt) / K

        @jax.jit
        def gradK(p, x, fn=fn):
            def loss(p):
                def body(x, _):
                    f = lambda x: fn(p, x).astype(x.dtype)
                    return jax.checkpoint(f)(x), None
                y, _ = jax.lax.scan(body, x, None, length=K)
                return jnp.sum(y.astype(jnp.float32))
            return jax.tree.leaves(jax.grad(loss)(p))[0].ravel()[0]

        t_g = (timeit(f"{tag}_fwdbwd", gradK, p, x) - rt) / K
        results[tag] = {"fwd_ms": round(t_f * 1000, 2),
                        "fwdbwd_ms": round(t_g * 1000, 2)}

    # useful FLOPs: 4 dense matmuls + attention core
    fl = 4 * 2.0 * L * DIM * DIM + 4.0 * L * L * DIM
    for tag, r in results.items():
        r["fwd_tflops"] = round(fl / (r["fwd_ms"] / 1000) / 1e12, 1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
