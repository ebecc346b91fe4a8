"""Bottom-up measured-composed 14B PRFL step estimate (VERDICT r2 item 2).

Measures every component of the 14B i2v PRFL step at its REAL per-device
shape on the actual chip and composes them into a full-step wall-clock
model for an 8-chip (data=2, sp=4) mesh at 720p x 81f (75,600 tokens).

Per-device Ulysses accounting (the round-2 block profile UNDERSTATED this:
a block measured at the 18,900-token local length runs local attention
only, but the Ulysses device attends the FULL 75,600 sequence with
heads/4 = 10 heads — 4x the attention FLOPs of the local-length block):

    block_fwd_dev = block_fwd(18.9k local)            # dense at local L
                  - flash_fwd(40h @ 18.9k)            # remove local attn
                  + flash_fwd(10h @ 75.6k)            # true Ulysses attn
                  + a2a                               # ICI estimate
    (same substitution for fwd+bwd, under the training remat policy)

    T_fwd  = 40 * block_fwd_dev + T_embeds_head
    T_grad = 40 * block_fwdbwd_dev + T_embeds_head_grad + T_opt
    T_step = mid_mean * (T_fwd + T_solver) + T_grad + (8/40)*T_fwd + T_grad

mid_mean = 19 (reference draws mid ~ U[0, 38], train_prfl.py:639-652);
LRM = first 8 blocks (configs feature_layer [8]); one global sample per
sp group (batch 1 per data replica, the reference's 720p configuration).

a2a: 3 qkv tensors in + 1 out per block fwd, each moving (sp-1)/sp of
[18900, 5120] bf16 = 139 MB/device; at ~100 GB/s effective ICI = 5.6 ms
per block fwd, 3x for fwd+bwd. Reported separately (XLA overlaps much of
it with compute; the composed number includes it, the _noa2a variant
excludes it — the truth is in between).

Output -> BENCH_COMPOSED.json (picked up by bench.py and published next to
the FLOP-ratio extrapolation).
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
from hyvideo_prfl_tpu.models.rope import rope_tables_rolled
from hyvideo_prfl_tpu.ops import flash_attention as fa

DIM, HEADS, FFN, LAYERS = 5120, 40, 13824, 40
# EST_SP=8 measures the reference-matched sp=8/batch-1 topology directly
# (5 heads @ 75.6k flash, 9,450-token local dense) instead of asserting
# t(sp8) = t(sp4)/2; output goes to BENCH_COMPOSED_SP8.json
SP = int(os.environ.get("EST_SP", "4"))
GRID = {4: (21, 45, 20), 8: (21, 45, 10), 2: (21, 45, 40),
        1: (21, 90, 40)}[SP]  # 75,600 / SP local tokens
L = GRID[0] * GRID[1] * GRID[2]
L_FULL = 75600
H_LOC = HEADS // SP  # heads per device during attention
MID_MEAN = 19.0
LRM_BLOCKS = 8
K = 2
A2A_GBPS = 100.0  # effective ICI all-to-all bandwidth assumption


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


def flash_times(heads, length, rt, tag):
    """(fwd, fwd+bwd) seconds for the flash kernel at [1, L, H, 128]."""
    q = jax.random.normal(jax.random.PRNGKey(0), (1, length, heads, 128),
                          jnp.bfloat16) * 0.1

    @jax.jit
    def fwdK(q):
        def body(q, _):
            return fa.flash_attention(q, q, q, bounded_logits=True).astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(q.astype(jnp.float32))

    t_f = (timeit(f"flash_fwd_{tag}", fwdK, q) - rt) / K

    @jax.jit
    def gradK(q):
        def loss(q):
            def body(q, _):
                f = lambda q: fa.flash_attention(q, q, q, bounded_logits=True).astype(q.dtype)
                return jax.checkpoint(
                    f, policy=wan_dit._attn_saveable_policy)(q), None
            y, _ = jax.lax.scan(body, q, None, length=K)
            return jnp.sum(y.astype(jnp.float32))
        return jax.grad(loss)(q).ravel()[0]

    t_fb = (timeit(f"flash_fwdbwd_{tag}", gradK, q) - rt) / K
    return t_f, t_fb


def main():
    policy_name = os.environ.get("EST_REMAT", "attn")
    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=1, remat=False)
    blk = wan_dit.WanBlock(cfg)
    cos, sin = rope_tables_rolled(GRID, cfg.head_dim)
    x = jnp.ones((1, L, DIM), jnp.float32) * 0.1
    ctx = jnp.ones((1, 512, DIM), jnp.bfloat16) * 0.1
    e6 = jnp.ones((1, 6, DIM), jnp.float32) * 0.1
    params = blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos, sin)

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    # --- local-length block (dense at the true local L; attention local) ---
    @jax.jit
    def fwdK(p, x):
        def body(x, _):
            return blk.apply(p, x, e6, ctx, cos, sin).astype(x.dtype), None
        x, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(x)

    t_blk_f = (timeit("block_fwd_local", fwdK, params, x) - rt) / K

    pol = (wan_dit._attn_saveable_policy if policy_name == "attn" else None)

    @jax.jit
    def gradK(p, x):
        def loss(p):
            def body(x, _):
                f = lambda x: blk.apply(p, x, e6, ctx, cos, sin
                                        ).astype(x.dtype)
                return jax.checkpoint(f, policy=pol)(x), None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(y)
        return jax.tree.leaves(jax.grad(loss)(p))[0].ravel()[0]

    t_blk_fb = (timeit("block_fwdbwd_local", gradK, params, x) - rt) / K

    # --- flash at the local-length (to subtract) and the TRUE Ulysses
    # per-device shape (10 heads @ 75.6k) ---
    t_fl_loc_f, t_fl_loc_fb = flash_times(HEADS, L, rt, f"{HEADS}h_loc{L}")
    t_fl_dev_f, t_fl_dev_fb = flash_times(H_LOC, L_FULL, rt,
                                          f"{H_LOC}h_75k6")

    # --- per-block communication: compiler-grounded when COMM_AUDIT.json
    # exists (scripts/audit_collectives.py: collective bytes/kinds read from
    # the compiled 14B HLO x the scaling-book ring model at the topology's
    # ICI link bandwidth), else the flat analytic estimate ---
    comm_source = "analytic"
    bytes_per_tensor = L * DIM * 2 * (SP - 1) / SP
    a2a_f = 4 * bytes_per_tensor / (A2A_GBPS * 1e9)  # q,k,v in + o out
    a2a_fb = 3 * a2a_f
    audit_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COMM_AUDIT.json")
    if SP == 4 and os.path.exists(audit_path):
        with open(audit_path) as fobj:
            audit = json.load(fobj).get("stages", {})
        if "fwd" in audit and "sft" in audit:
            a2a_f = audit["fwd"]["total_seconds"] / LAYERS
            a2a_fb = audit["sft"]["total_seconds"] / LAYERS
            comm_source = "hlo_audit"

    blk_dev_f = t_blk_f - t_fl_loc_f + t_fl_dev_f + a2a_f
    blk_dev_fb = t_blk_fb - t_fl_loc_fb + t_fl_dev_fb + a2a_fb

    # --- embeds + head at the local shard ---
    emb_cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                                num_heads=HEADS, num_layers=0, remat=False)
    model0 = wan_dit.WanModel(emb_cfg)
    lat = jnp.ones((1, 21, 90, 160 // SP, 16), jnp.float32)  # L local tokens
    txt = jnp.ones((1, 512, 4096), jnp.float32) * 0.1
    t_in = jnp.full((1,), 500.0, jnp.float32)
    p0 = model0.init(jax.random.PRNGKey(1), lat, t_in, txt)

    @jax.jit
    def embK(p, lat):
        def body(lat, _):
            o = model0.apply(p, lat, t_in, txt)
            return o[..., :16].astype(lat.dtype), None
        lat, _ = jax.lax.scan(body, lat, None, length=K)
        return jnp.sum(lat)

    # clamp like the solver: embeds are roundtrip-sized, so the rt
    # subtraction can go slightly negative on a noisy fetch
    t_emb_f = max(0.0, (timeit("embeds_head_fwd", embK, p0, lat) - rt) / K)

    @jax.jit
    def embGradK(p, lat):
        def loss(p):
            def body(lat, _):
                o = model0.apply(p, lat, t_in, txt)
                return o[..., :16].astype(lat.dtype), None
            y, _ = jax.lax.scan(body, lat, None, length=K)
            return jnp.sum(y)
        # num_layers=0 leaves empty block params; sum every leaf instead
        # of indexing the first
        g = jax.grad(loss)(p)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    t_emb_fb = max(0.0, (timeit("embeds_head_fwdbwd", embGradK, p0, lat)
                         - rt) / K)

    # --- UniPC solver step on the local latent shard ---
    from hyvideo_prfl_tpu.schedulers import unipc

    sched = unipc.unipc_schedule(40, shift=5.0)

    @jax.jit
    def solverK(v, x):
        st = unipc.init_state(x.shape, jnp.float32)
        c = jax.tree.map(lambda a: a[0], sched.coeffs)

        def body(carry, _):
            x, st = carry
            x2, st2 = unipc._apply(c, st, v, x)
            return (x2, st2), None
        (x, _), _ = jax.lax.scan(body, (x, st), None, length=8)
        return jnp.sum(x)

    # clamp: the solver is ~roundtrip-sized, so the subtraction can go
    # slightly negative on a noisy fetch
    t_solver = max(0.0, (timeit("solver8", solverK, jnp.ones_like(lat), lat)
                         - rt) / 8)

    # --- AdamW bandwidth proxy: 0.125B fp32 params on-device, scaled to
    # the per-device 1.75B FSDP shard (bandwidth-bound => linear) ---
    import optax

    n_proxy = 125_000_000
    w = jnp.ones((n_proxy,), jnp.float32)
    tx = optax.adamw(1e-5)
    opt0 = tx.init(w)

    @jax.jit
    def optK(w, opt, g):
        def body(carry, _):
            w, opt = carry
            up, opt = tx.update(g, opt, w)
            return (optax.apply_updates(w, up), opt), None
        (w, opt), _ = jax.lax.scan(body, (w, opt), None, length=K)
        return jnp.sum(w[:8])

    g = jnp.full((n_proxy,), 1e-6, jnp.float32)
    t_opt_proxy = (timeit("adamw_0.125b", optK, w, opt0, g) - rt) / K
    t_opt = t_opt_proxy * (14e9 / 8) / n_proxy

    # --- composition ---
    def compose(bf, bfb):
        t_fwd = LAYERS * bf + t_emb_f
        t_grad = LAYERS * bfb + t_emb_fb + t_opt
        t_lrm = LRM_BLOCKS * bf + t_emb_f
        return MID_MEAN * (t_fwd + t_solver) + t_grad + t_lrm + t_grad

    t_step = compose(blk_dev_f, blk_dev_fb)
    t_step_noa2a = compose(blk_dev_f - a2a_f, blk_dev_fb - a2a_fb)

    # useful FLOPs per device (attention = full-seq x local-heads)
    dense_f = 2.0 * (8 * DIM * DIM + 2 * DIM * FFN) * L
    attn_f = 4.0 * L_FULL * L_FULL * DIM / SP + 4.0 * L * 512 * DIM
    blk_f = dense_f + attn_f
    fwd_f = LAYERS * blk_f
    step_f = (MID_MEAN + 3 + LRM_BLOCKS / LAYERS + 3) * fwd_f
    tflops = step_f / t_step / 1e12

    # reference-matched topology: the 51.11 s/step efficiency row is
    # GLOBAL BATCH 1 on 8 GPUs (1.75e17 total step FLOPs / 8 / 990 TF/s
    # = 43% MFU only fits batch 1) — i.e. all 8 devices in one sp group.
    # EST_SP=8 MEASURES that topology directly (t_step IS the batch-1
    # step); at the default sp=4 we scale: every per-device component
    # halves (dense: L_local/2; flash: heads/2 at the same 75.6k length),
    # so t(sp8, batch1) ~= t(sp4)/2.
    t_step_b1 = t_step * SP / 8  # exact at SP=8; linear-scaling assumption otherwise
    ref_peak_pf = 8 * 990e12
    our_peak_pf = 8 * 197e12
    flop_norm_speedup = (51.11 * ref_peak_pf) / (t_step_b1 * our_peak_pf)

    out = {
        "policy": policy_name,
        "sp": SP,
        "comm_source": comm_source,
        "block_fwd_local_ms": round(t_blk_f * 1e3, 1),
        "block_fwdbwd_local_ms": round(t_blk_fb * 1e3, 1),
        "flash_fwd_40h_18k9_ms": round(t_fl_loc_f * 1e3, 1),
        "flash_fwd_10h_75k6_ms": round(t_fl_dev_f * 1e3, 1),
        "flash_fwdbwd_10h_75k6_ms": round(t_fl_dev_fb * 1e3, 1),
        "block_fwd_dev_ms": round(blk_dev_f * 1e3, 1),
        "block_fwdbwd_dev_ms": round(blk_dev_fb * 1e3, 1),
        "a2a_fwd_ms_est": round(a2a_f * 1e3, 1),
        "embeds_head_fwd_ms": round(t_emb_f * 1e3, 1),
        "embeds_head_fwdbwd_ms": round(t_emb_fb * 1e3, 1),
        "solver_step_ms": round(t_solver * 1e3, 2),
        "adamw_14b_per_dev_ms": round(t_opt * 1e3, 1),
        "composed_step_s": round(t_step, 2),
        "composed_step_noa2a_s": round(t_step_noa2a, 2),
        "composed_tflops_per_chip": round(tflops, 1),
        "composed_mfu_pct_v5e": round(100 * tflops / 197, 1),
        "baseline_ref_s": 51.11,
        "vs_ref_same_chipcount": round(51.11 / t_step, 3),
        "composed_step_sp8_batch1_s": round(t_step_b1, 2),
        "vs_ref_batch_matched": round(51.11 / t_step_b1, 3),
        "flop_normalized_speedup_vs_ref": round(flop_norm_speedup, 2),
        "projected_v5p16_s": round(t_step_b1 * our_peak_pf / (16 * 459e12),
                                   2),
    }
    # restate the composed step as a [full-overlap, no-overlap] interval
    # against the audited comm (same composition as audit_collectives.main;
    # written here too so a re-run of this script cannot drop the fields)
    if comm_source == "hlo_audit":
        c_refl = (MID_MEAN * audit["fwd"]["total_seconds"]
                  + audit["sft"]["total_seconds"]
                  + LRM_BLOCKS / LAYERS * audit["fwd"]["total_seconds"]
                  + audit["sft"]["total_seconds"])
        out["comm_audit_refl_s"] = round(c_refl, 3)
        out["composed_step_interval_s"] = [
            round(max(t_step_noa2a, c_refl), 2),
            round(t_step_noa2a + c_refl, 2)]
    # contention self-check: the shared remote TPU service can be busy
    # enough to corrupt timings (observed: fwd+bwd < fwd, AdamW 6x off its
    # bandwidth roofline, "MFU" > 100%). Mark such runs invalid rather
    # than publishing them.
    suspicious = []
    if t_fl_dev_fb < t_fl_dev_f or t_blk_fb < t_blk_f:
        suspicious.append("fwd+bwd measured faster than fwd")
    if out["composed_mfu_pct_v5e"] > 100:
        suspicious.append("composed MFU > 100%")
    if t_opt_proxy > 0.025:  # 0.125B fp32 AdamW roofline ~5 ms; 5x margin
        suspicious.append(f"AdamW proxy {t_opt_proxy * 1e3:.1f} ms >> roofline")
    if suspicious:
        out["suspect_contention"] = suspicious
        print(json.dumps({"warning": "timings look contended; rerun",
                          "reasons": suspicious}), flush=True)
    print(json.dumps(out), flush=True)
    name = "BENCH_COMPOSED.json" if SP == 4 else f"BENCH_COMPOSED_SP{SP}.json"
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), name), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
