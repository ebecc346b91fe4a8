"""Benchmark: PRFL post-training step time on the available TPU.

Reference headline (BASELINE.md): 14B model, 720P x 81 frames (75,600
tokens), sp=4 over 8 x 80GB GPUs -> 51.11 s/step (43.69 s without the SFT
loss). This harness has ONE v5e-class chip, so we measure the full PRFL
step (no-grad UniPC rollout + 1 grad step + frozen LRM reward + SFT step)
at a single-chip-feasible scale and report:

  * measured seconds/step at the bench scale
  * an extrapolated 14B/75.6k-token estimate from the FLOP ratio
  * vs_baseline = 51.11 / extrapolated (>1 means faster than reference)

One JSON line on stdout, as required by the driver contract.
"""

import json
import time

import jax
import jax.numpy as jnp

# ---- bench scale (fits one chip incl. fp32 AdamW state: ~0.6B params) ----
# dim 1280 / 24 layers DiT, 480p-class bucket: grid f=8, 30x52 -> 3120 tokens
BENCH_DIM = 1280
BENCH_LAYERS = 24
BENCH_FFN = 4480
BENCH_HEADS = 10
GRID = (8, 30, 52)
# The reference's headline workload runs a 40-step UniPC rollout
# (inference_steps=40, BASELINE.md); rounds 1-2 benched a truncated
# 8-step rollout (rollout_steps=8 in BENCH_r0{1,2}.json), which
# over-weights the optimizer/overhead share relative to the reference's
# actual workload mix. Worst-case mid on both sides, as before.
ROLLOUT_STEPS = 40


def _flops_scale():
    """FLOP ratio (reference workload) / (bench workload) for extrapolation.

    DiT fwd FLOPs ~ 2 * params * tokens + attention O(L^2 * dim). Use the
    dominant dense term + attention term explicitly.
    """
    def step_flops(p, l, d, n_layers, rollout, grad_steps=2):
        dense = 2.0 * p * l  # matmul FLOPs per fwd
        attn = 4.0 * l * l * d * n_layers
        fwd = dense + attn
        # rollout fwds (worst-case mid on both sides) +
        # 1 fwd+bwd (3x fwd) + lrm fwd (0.2 of model) + sft fwd+bwd (3x)
        return fwd * (rollout + 3 + 0.2 + 3)

    ref = step_flops(14e9, 75600, 5120, 40, rollout=39)
    ours = step_flops(
        _bench_params(), GRID[0] * (GRID[1] // 2) * (GRID[2] // 2),
        BENCH_DIM, BENCH_LAYERS, rollout=ROLLOUT_STEPS - 2,
    )
    return ref / ours


def _bench_params():
    d, l, ffn = BENCH_DIM, BENCH_LAYERS, BENCH_FFN
    per_block = 8 * d * d + 2 * d * ffn + 8 * d  # attn(self+cross) + ffn
    return per_block * l + 30e6  # + embeds/head


def main():
    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.training import common
    from hyvideo_prfl_tpu.training.pavrm import PavrmConfig
    from hyvideo_prfl_tpu.training.prfl import (
        PrflConfig, PrflModel, make_refl_step, make_sft_step,
    )
    from hyvideo_prfl_tpu.schedulers import flow_match as fm

    import os
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    # "attn" saves the flash custom_vjp residuals so the backward skips the
    # flash forward recompute (wan_dit._attn_saveable_policy); override
    # with BENCH_REMAT_POLICY=full to measure the round-2 arrangement
    remat_policy = os.environ.get("BENCH_REMAT_POLICY", "attn")
    dit_cfg = wan_dit.WanConfig(
        model_type="t2v", dim=BENCH_DIM, ffn_dim=BENCH_FFN,
        num_heads=BENCH_HEADS, num_layers=BENCH_LAYERS, remat=remat,
        remat_policy=remat_policy,
    )
    pc = PavrmConfig(loss="ce", feature_layer=(8,))
    # worst-case mid, pinned for reproducible timing
    prfl_cfg = PrflConfig(inference_steps=ROLLOUT_STEPS, flow_shift=5.0,
                          fixed_mid=ROLLOUT_STEPS - 2)
    model = PrflModel(dit_cfg, pc, prfl_cfg)

    params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    lrm_trainable, lrm_frozen = model.lrm.init_all(jax.random.PRNGKey(1))
    lrm_dit = common.merge_tree(
        {"params": {"blocks": lrm_trainable["blocks"]}}, lrm_frozen
    )
    tx = common.make_optimizer(learning_rate=1e-6)
    state = common.init_train_state(params, tx)

    f, h, w = GRID
    batch = {
        "latents": jnp.zeros((1, f, h, w, 16), jnp.float32),
        "text": jnp.zeros((1, dit_cfg.text_len, dit_cfg.text_dim), jnp.float32),
    }
    lrm_tower = {"dit": lrm_dit, "q": {"params": lrm_trainable["q_attn"]},
                 "m": {"params": lrm_trainable["mlp"]}}
    refl0 = jax.jit(make_refl_step(model, tx), donate_argnums=(0,))
    refl = lambda s, b, k: refl0(s, b, k, lrm_tower)
    sft = jax.jit(make_sft_step(model, tx, fm.train_schedule(1000)),
                  donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)

    # warmup/compile one step of each + force completion (the proxied
    # backend's block_until_ready returns early; only scalar fetches wait)
    rng, k = jax.random.split(rng)
    state, m = refl(state, batch, k)
    state, m2 = sft(state, batch, k)
    _ = float(m["loss"]) + float(m2["loss"])

    # timing: K steps dispatched back-to-back, ONE scalar fetch at the end
    # (the final loss depends on the whole donated-state chain). This is the
    # production loop shape — metric logging is async and never blocks the
    # next step's dispatch.
    K = 3
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            rng, k = jax.random.split(rng)
            state, m = refl(state, batch, k)
            state, m2 = sft(state, batch, k)
        _ = float(m["loss"]) + float(m2["loss"])
        times.append((time.perf_counter() - t0) / K)
    sec = min(times)

    scale = _flops_scale()
    extrapolated_14b = sec * scale / 8.0  # reference step is on 8 GPUs
    vs = 51.11 / extrapolated_14b

    # auditable efficiency accounting (VERDICT r1 item 4)
    def step_flops(p, l, d, n_layers, rollout):
        fwd = 2.0 * p * l + 4.0 * l * l * d * n_layers
        return fwd * (rollout + 3 + 0.2 + 3)

    l_bench = GRID[0] * (GRID[1] // 2) * (GRID[2] // 2)
    our_flops = step_flops(_bench_params(), l_bench, BENCH_DIM, BENCH_LAYERS,
                           ROLLOUT_STEPS - 2)
    achieved_tfs = our_flops / sec / 1e12

    # bottom-up MEASURED-COMPOSED estimate (scripts/estimate_14b_step.py:
    # real 14B-dim components at the 18.9k-token Ulysses shard, composed
    # into the full refl+SFT step) — published alongside the FLOP-ratio
    # extrapolation per VERDICT r2 item 2
    composed = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_COMPOSED.json")) as f:
            c = json.load(f)
        composed = {
            "composed_14b_8chip_s": c["composed_step_s"],
            "composed_mfu_pct": c["composed_mfu_pct_v5e"],
            "vs_baseline_composed": round(51.11 / c["composed_step_s"], 3),
        }
        if "composed_step_interval_s" in c:
            # compiler-grounded comm band (scripts/audit_collectives.py):
            # [full-overlap, no-overlap] against the measured compute
            composed["composed_interval_s"] = c["composed_step_interval_s"]
            composed["comm_audit_refl_s"] = c.get("comm_audit_refl_s")
        if "composed_step_interval_async_s" in c:
            # torus-priced, chunked-async-schedule residual bound: the
            # tightest justified interval (VERDICT r4 next #7)
            composed["composed_interval_async_s"] = (
                c["composed_step_interval_async_s"])
        if "composed_step_rollout_int8_s" in c:
            # opt-in int8 no-grad rollout (train.rollout_quant:
            # scripts/profile_rollout_int8.py)
            composed["composed_rollout_int8_s"] = (
                c["composed_step_rollout_int8_s"])
            composed["rollout_int8_speedup"] = c.get("rollout_int8_speedup")
    except Exception:
        pass
    try:
        # measured (not scaled) sp=8 batch-1 composition — the reference's
        # 51.11 s row is global batch 1 on 8 GPUs (EST_SP=8 run)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_COMPOSED_SP8.json")) as f:
            c8 = json.load(f)
        composed["composed_sp8_batch1_measured_s"] = c8["composed_step_s"]
    except Exception:
        pass
    try:
        # measured-composed SERVING chain (scripts/estimate_serving.py:
        # 14B i2v 720p x 81f UniPC-40 batched CFG on 8 x v5e, uly8), bf16
        # and the int8 W8A8 path, with the audited comm intervals
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_SERVING.json")) as f:
            sv = json.load(f)
        composed["serving_chain_bf16_s"] = sv["bf16"]["chain_compute_s"]
        composed["serving_chain_int8_s"] = sv["int8"]["chain_compute_s"]
        composed["serving_int8_speedup"] = sv["int8_speedup_compute"]
        if "chain_interval_chunked_async_s" in sv["int8"]:
            composed["serving_int8_interval_s"] = (
                sv["int8"]["chain_interval_chunked_async_s"])
        if "end_to_end_with_decode_s" in sv["int8"]:
            # sampling chain + the once-per-clip W-sharded VAE decode tail
            # (scripts/profile_vae_decode.py)
            composed["serving_int8_e2e_with_decode_s"] = (
                sv["int8"]["end_to_end_with_decode_s"])
        if "int8_qk8" in sv:
            # the full opt-in quant config: W8A8 dense + qk-int8 flash
            composed["serving_int8_qk8_speedup"] = (
                sv.get("int8_qk8_speedup_compute"))
            composed["serving_int8_qk8_e2e_with_decode_s"] = (
                sv["int8_qk8"].get("end_to_end_with_decode_s"))
    except Exception:
        pass
    print(json.dumps({
        "metric": "prfl_step_seconds_0.6b_3120tok_40step_1chip",
        "value": round(sec, 3),
        "unit": "s/step",
        "vs_baseline": round(vs, 3),
        "extrapolated_14b_75k6_8chip_s": round(extrapolated_14b, 2),
        "baseline_14b_75k6_8gpu_s": 51.11,
        "flop_scale": round(scale, 1),
        "rollout_steps": ROLLOUT_STEPS,
        "achieved_tflops_per_chip": round(achieved_tfs, 1),
        "assumed_peak_tflops_bf16_v5e": 197,
        "mfu_pct": round(100 * achieved_tfs / 197, 1),
        **composed,
    }))


if __name__ == "__main__":
    main()
