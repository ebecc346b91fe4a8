"""Decompose the bench.py PRFL step (0.6B, 3120 tokens, 1 chip) into its
phases so the bench-scale MFU attack targets the right slice:

* rollout-only (fixed_mid fwds through the no-grad UniPC scan)
* refl grad step total (rollout + grad + LRM reward + opt)
* SFT step (fwd+bwd + opt)
* a bare DiT forward and a bare value_and_grad step at the same shape
* a bare AdamW apply on the same param tree

Timing per CLAUDE.md: chained dispatches, one scalar fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BENCH_DIM = int(os.environ.get("BD_DIM", 1280))
BENCH_LAYERS = int(os.environ.get("BD_LAYERS", 24))
BENCH_FFN = int(os.environ.get("BD_FFN", 4480))
BENCH_HEADS = int(os.environ.get("BD_HEADS", 10))
GRID = tuple(int(v) for v in os.environ.get("BD_GRID", "8,30,52").split(","))
ROLLOUT_STEPS = int(os.environ.get("BD_ROLLOUT", 8))


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
    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.training import common
    from hyvideo_prfl_tpu.training.pavrm import PavrmConfig
    from hyvideo_prfl_tpu.training.prfl import (
        PrflConfig, PrflModel, make_refl_step, make_sft_step,
    )
    from hyvideo_prfl_tpu.schedulers import flow_match as fm

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    dit_cfg = wan_dit.WanConfig(
        model_type="t2v", dim=BENCH_DIM, ffn_dim=BENCH_FFN,
        num_heads=BENCH_HEADS, num_layers=BENCH_LAYERS, remat=True,
        remat_policy="attn",
    )
    pc = PavrmConfig(loss="ce", feature_layer=(8,))
    prfl_cfg = PrflConfig(inference_steps=ROLLOUT_STEPS, flow_shift=5.0,
                          fixed_mid=ROLLOUT_STEPS - 2)
    model = PrflModel(dit_cfg, pc, prfl_cfg)

    params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    lrm_trainable, lrm_frozen = model.lrm.init_all(jax.random.PRNGKey(1))
    lrm_dit = common.merge_tree(
        {"params": {"blocks": lrm_trainable["blocks"]}}, lrm_frozen
    )
    tx = common.make_optimizer(learning_rate=1e-6)
    # the refl/sft steps donate the state; keep an undonated params copy
    # for the bare fwd/grad/opt measurements below
    state = common.init_train_state(jax.tree.map(jnp.copy, params), tx)

    f, h, w = GRID
    batch = {
        "latents": jnp.zeros((1, f, h, w, 16), jnp.float32),
        "text": jnp.zeros((1, dit_cfg.text_len, dit_cfg.text_dim),
                          jnp.float32),
    }
    lrm_tower = {"dit": lrm_dit, "q": {"params": lrm_trainable["q_attn"]},
                 "m": {"params": lrm_trainable["mlp"]}}

    K = 3
    rng = jax.random.PRNGKey(0)

    # --- full refl step (as bench.py; donated chain, one fetch) ---
    refl0 = jax.jit(make_refl_step(model, tx), donate_argnums=(0,))

    holder = [state]

    def reflK(k):
        s = holder[0]
        for i in range(K):
            s, m = refl0(s, batch, jax.random.fold_in(k, i), lrm_tower)
        holder[0] = s  # donated chain: keep the live state for the next call
        return m["loss"]

    t_refl = (timeit("refl_step", reflK, rng) - rt) / K

    # --- SFT step ---
    sft0 = jax.jit(make_sft_step(model, tx, fm.train_schedule(1000)),
                   donate_argnums=(0,))

    def sftK(k):
        s = holder[0]
        for i in range(K):
            s, m = sft0(s, batch, jax.random.fold_in(k, i))
        holder[0] = s
        return m["loss"]

    t_sft = (timeit("sft_step", sftK, rng) - rt) / K
    del holder

    # --- bare forward at the rollout shape ---
    mdl = wan_dit.WanModel(dit_cfg)
    x = jnp.zeros((1, f, h, w, 16), jnp.float32)
    t_emb = jnp.full((1,), 500.0, jnp.float32)
    text = batch["text"]

    @jax.jit
    def fwdK(params, x):
        def body(x, _):
            y = mdl.apply(params, x, t_emb, text)
            return y.astype(x.dtype), None
        y, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(y.astype(jnp.float32))

    t_fwd = (timeit("dit_fwd", fwdK, params, x) - rt) / K

    # --- bare value_and_grad at the SFT shape (no optimizer) ---
    def loss_fn(p, xc):
        y = mdl.apply(p, xc, t_emb, text)
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    @jax.jit
    def gradK(params, x):
        # carry feeds the input so the K bodies can't be CSE'd into one
        def body(c, _):
            l, g = jax.value_and_grad(loss_fn)(params, x + c * 1e-12)
            return l + jax.tree.leaves(g)[0].ravel()[0] * 1e-12, None
        c, _ = jax.lax.scan(body, 0.0, None, length=K)
        return c

    t_grad = (timeit("dit_value_and_grad", gradK, params, x) - rt) / K

    # --- bare optimizer apply ---
    grads = jax.tree.map(jnp.zeros_like, params)
    opt_state = tx.init(params)

    @jax.jit
    def optK(params, opt_state, grads):
        import optax
        for _ in range(K):
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return jnp.sum(jax.tree.leaves(params)[0].ravel()[:1])

    t_opt = (timeit("adamw_apply", optK, params, opt_state, grads) - rt) / K

    n_fwds = ROLLOUT_STEPS - 2
    print(json.dumps({
        "refl_step_ms": round(t_refl * 1e3, 1),
        "sft_step_ms": round(t_sft * 1e3, 1),
        "dit_fwd_ms": round(t_fwd * 1e3, 1),
        "rollout_est_ms": round(t_fwd * n_fwds * 1e3, 1),
        "dit_value_and_grad_ms": round(t_grad * 1e3, 1),
        "adamw_apply_ms": round(t_opt * 1e3, 1),
        "refl_unexplained_ms": round(
            (t_refl - t_fwd * n_fwds - t_grad - t_fwd * 0.4 - t_opt) * 1e3,
            1),  # lrm fwd ~ 8/24 blocks + heads ~ 0.4 fwd
        "sft_unexplained_ms": round((t_sft - t_grad - t_opt) * 1e3, 1),
        "step_total_ms": round((t_refl + t_sft) * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
