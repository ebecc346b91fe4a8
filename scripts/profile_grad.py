"""Grad-step variants at bench scale: remat policy x residual dtype."""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from hyvideo_prfl_tpu.models import wan_dit

DIM, HEADS, FFN, LAYERS = 1280, 10, 4480, 24
GRID = (8, 30, 52)


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
    base = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                             num_heads=HEADS, num_layers=LAYERS, remat=True)
    params = wan_dit.init_params(base, jax.random.PRNGKey(0))
    f, h, w = GRID
    x = jnp.zeros((1, f, h, w, 16), jnp.float32)
    t = jnp.ones((1,), jnp.float32) * 500
    ctx = jnp.zeros((1, base.text_len, base.text_dim), jnp.float32)

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    def make_grad(cfg):
        model = wan_dit.WanModel(cfg)

        @jax.jit
        def gstep(params, x, t, ctx):
            def loss(p):
                v = model.apply(p, x, t, ctx)
                return jnp.mean(jnp.square(v))
            l, g = jax.value_and_grad(loss)(params)
            return l + optax.global_norm(g)
        return gstep

    variants = {
        "grad_dots_all": dataclasses.replace(base, remat_policy="dots_all"),
        "grad_dots_all_bf16res": dataclasses.replace(
            base, remat_policy="dots_all", residual_dtype=jnp.bfloat16),
        "grad_full_bf16res": dataclasses.replace(
            base, residual_dtype=jnp.bfloat16),
    }
    res = {"roundtrip": rt}
    for tag, cfg in variants.items():
        try:
            res[tag] = timeit(tag, make_grad(cfg), params, x, t, ctx)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": str(e)[:200]}), flush=True)

    def make_rollout(cfg):
        model = wan_dit.WanModel(cfg)

        @jax.jit
        def rollout8(params, x, t, ctx):
            def body(x, _):
                return model.apply(params, x, t, ctx), None
            x2, _ = jax.lax.scan(body, x, None, length=8)
            return jnp.sum(x2)
        return rollout8

    res["rollout8_bf16res"] = timeit(
        "rollout8_bf16res",
        make_rollout(dataclasses.replace(base,
                                         residual_dtype=jnp.bfloat16)),
        params, x, t, ctx)
    print(json.dumps({k: round(v - rt, 4) for k, v in res.items()
                      if k != "roundtrip"}), flush=True)


if __name__ == "__main__":
    main()
