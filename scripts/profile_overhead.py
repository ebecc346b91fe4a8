"""Non-block forward overhead probe: time the full WanModel forward at
layer counts {1, 8, 24} and fit intercept = embeds/head/unpatchify/scan
overhead (bench scale). The block slope should match profile_step5's
block_per_block_ms; the intercept is the optimization target."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
    f, h, w = GRID
    xv = jnp.zeros((1, f, h, w, 16), jnp.float32)
    t = jnp.ones((1,), jnp.float32) * 500

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    res = {}
    for n_layers in (1, 8, 24):
        cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                                num_heads=HEADS, num_layers=n_layers,
                                remat=False)
        params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
        model = wan_dit.WanModel(cfg)
        ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)

        @jax.jit
        def fwd4(params, x, t, ctx, model=model):
            def body(x, _):
                return model.apply(params, x, t, ctx), None
            x, _ = jax.lax.scan(body, x, None, length=4)
            return jnp.sum(x)

        res[n_layers] = (timeit(f"fwd4_L{n_layers}", fwd4, params, xv, t,
                                ctx) - rt) / 4 * 1000

    slope = (res[24] - res[8]) / 16
    intercept = res[8] - 8 * slope
    print(json.dumps({
        "fwd_ms_L1": round(res[1], 2),
        "fwd_ms_L8": round(res[8], 2),
        "fwd_ms_L24": round(res[24], 2),
        "block_slope_ms": round(slope, 3),
        "overhead_intercept_ms": round(intercept, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
