"""Profile the optimizer chain at bench scale (0.62B fp32 params).

The bench decomposition (profile_bench_decomp.py) leaves ~54 ms/step
unexplained in the SFT step beyond value_and_grad — consistent with the
optax clip->adamw->apply chain materializing every intermediate tree
(~37 GB of HBM traffic at 0.62B fp32). Measures:

* apply_grads as-trained (optax chain + global-norm clip), donated
* a hand-fused single-expression update (one read of g/m/v/p, one write
  of m'/v'/p' per leaf — the XLA-fusable form)
* the theoretical bandwidth floor for comparison
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.training import common

DIM, HEADS, FFN, LAYERS = 1280, 10, 4480, 24
K = 3


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

    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=LAYERS)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(json.dumps({"n_params": n_params}), flush=True)

    tx = common.make_optimizer(learning_rate=1e-6)
    grads = jax.tree.map(
        lambda p: (jnp.ones_like(p) * 1e-5).astype(p.dtype), params)

    # --- as-trained optax chain, donated like the real step ---
    @functools_partial_jit_donate
    def optax_chain(state, grads):
        new_state, gnorm = common.apply_grads(state, tx, grads)
        return new_state, gnorm

    state = common.init_train_state(jax.tree.map(jnp.copy, params), tx)
    holder = [state]

    def run_optax(_):
        s = holder[0]
        for _ in range(K):
            s, gn = optax_chain(s, grads)
        holder[0] = s
        return gn

    t_optax = (timeit("optax_chain", run_optax, 0) - rt) / K
    del holder

    # --- hand-fused single-expression AdamW + clip ---
    lr, b1, b2, eps, wd, maxn = 1e-6, 0.9, 0.999, 1e-8, 0.01, 1.0

    @functools_partial_jit_donate3
    def fused(params, m, v, grads, step):
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads)))
        scale = jnp.minimum(1.0, maxn / jnp.maximum(gnorm, 1e-12))
        c1 = 1.0 - b1 ** (step + 1)
        c2 = 1.0 - b2 ** (step + 1)

        def upd(p, m_, v_, g):
            g = g * scale
            m2 = b1 * m_ + (1 - b1) * g
            v2 = b2 * v_ + (1 - b2) * jnp.square(g)
            u = m2 / c1 / (jnp.sqrt(v2 / c2) + eps) + wd * p
            return p - lr * u, m2, v2

        out = jax.tree.map(upd, params, m, v, grads)
        new_p = jax.tree.map(lambda t: t[0], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        new_m = jax.tree.map(lambda t: t[1], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        new_v = jax.tree.map(lambda t: t[2], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        return new_p, new_m, new_v, gnorm

    p2 = jax.tree.map(jnp.copy, params)
    m0 = jax.tree.map(jnp.zeros_like, params)
    v0 = jax.tree.map(jnp.zeros_like, params)
    holder2 = [(p2, m0, v0)]

    def run_fused(_):
        p, m, v = holder2[0]
        for i in range(K):
            p, m, v, gn = fused(p, m, v, grads, jnp.asarray(i, jnp.int32))
        holder2[0] = (p, m, v)
        return gn

    t_fused = (timeit("fused_adamw", run_fused, 0) - rt) / K

    bw = 819e9  # v5e HBM
    floor_bytes = n_params * 4 * (4 + 3)  # R g,m,v,p + W m,v,p
    print(json.dumps({
        "optax_chain_ms": round(t_optax * 1e3, 1),
        "fused_adamw_ms": round(t_fused * 1e3, 1),
        "bandwidth_floor_ms": round(floor_bytes / bw * 1e3, 1),
        "note": "plus one extra grads read for the norm in both variants",
    }), flush=True)


def functools_partial_jit_donate(f):
    return jax.jit(f, donate_argnums=(0,))


def functools_partial_jit_donate3(f):
    return jax.jit(f, donate_argnums=(0, 1, 2))


if __name__ == "__main__":
    main()
