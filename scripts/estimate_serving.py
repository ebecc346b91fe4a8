"""Bottom-up measured-composed 14B SERVING chain estimate, bf16 vs int8.

The training-side composed estimate (scripts/estimate_14b_step.py) grounds
the PRFL step headline; this is its serving twin: the full 14B i2v
720p x 81f CFG UniPC-40 sampling chain (the reference's inference path,
diffusers_lite/wan/image2video.py generate(): 40 solver steps, each one
batched cond+uncond DiT forward), composed from components measured at
their TRUE per-device shapes on the real chip, for BOTH the bf16 path and
the int8 W8A8 serving path (WanConfig.quant_dense).

Topology: 8 x v5e, pure Ulysses sp=8 ("uly8") — the audit's preferred
serving layout when heads divide (COMM_AUDIT usp_uly8: same priced comm as
ring2 x uly4 under the single-axis model, no ring-kv permute toll on the
2D torus). Per device: dense at the local 75,600/8 = 9,450 tokens,
attention over the full 75,600 sequence with 40/8 = 5 heads, CFG as one
batch-2 forward. The same Ulysses substitution as the training estimator:

    blk_dev = blk_fwd(9,450 local, b2)      # dense at local L
            - flash_fwd(40h @ 9,450, b2)    # remove local attn
            + flash_fwd(5h @ 75,600, b2)    # true Ulysses attn

    T_fwd   = 40 * blk_dev + T_embeds_head
    T_chain = 40 * (T_fwd + T_solver)       # UniPC: 1 model eval/step

Communication comes from the compiler-grounded audit (COMM_AUDIT.json
stages usp_uly8 / usp_uly8_int8 — per-chain collective bytes read from the
compiled HLO x the ring wire model), restated as the
[full-overlap, no-overlap] interval like the training estimate.

TeaCache is off (worst case: every step pays a full forward); the audited
skip behavior is checkpoint-dependent and reported elsewhere
(ops/teacache.py). T5/CLIP encode and the VAE decode are once-per-clip
costs outside the 40-step chain; the VAE decode is measured separately by
scripts/profile_vae_decode.py and carried as its own row.

Output -> BENCH_SERVING.json (picked up by bench.py).
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
from hyvideo_prfl_tpu.ops import quant

DIM, HEADS, FFN, LAYERS = 5120, 40, 13824, 40
SP = 8                       # pure Ulysses over all 8 chips
GRID = (21, 45, 10)          # 9,450 local tokens (75,600 / 8)
L = GRID[0] * GRID[1] * GRID[2]
L_FULL = 75600
H_LOC = HEADS // SP          # 5 heads per device during attention
B = 2                        # batched CFG (cond + uncond)
CTX = 769                    # 257 CLIP + 512 T5 tokens (i2v)
STEPS = 40                   # UniPC-40
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


def flash_fwd_time(heads, length, rt, tag, qk_int8=False):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, length, heads, 128),
                          jnp.bfloat16) * 0.1

    @jax.jit
    def fwdK(q):
        def body(q, _):
            return fa.flash_attention(
                q, q, q, bounded_logits=True,
                qk_int8=qk_int8).astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(q.astype(jnp.float32))

    return (timeit(f"flash_fwd_{tag}", fwdK, q) - rt) / K


def _measure():
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    cos, sin = rope_tables_rolled(GRID, DIM // HEADS)
    x = jnp.ones((B, L, DIM), jnp.float32) * 0.1
    ctx = jnp.ones((B, CTX, DIM), jnp.bfloat16) * 0.1
    e6 = jnp.ones((B, 6, DIM), jnp.float32) * 0.1

    # --- serving block forward, bf16 and int8, at the local length ---
    blk_t = {}
    p_bf16 = None
    for tag, qd in (("bf16", None), ("int8", "int8")):
        cfg = wan_dit.WanConfig(model_type="i2v", in_dim=36, dim=DIM,
                                ffn_dim=FFN, num_heads=HEADS, num_layers=1,
                                remat=False, quant_dense=qd)
        blk = wan_dit.WanBlock(cfg)
        if qd is None:
            p = blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos, sin)
            p_bf16 = p
        else:
            qshapes = jax.eval_shape(
                lambda blk=blk: blk.init(jax.random.PRNGKey(0), x, e6, ctx,
                                         cos, sin))
            p = quant.quantize_params(p_bf16, qshapes)

        @jax.jit
        def fwdK(p, x, blk=blk):
            def body(x, _):
                return blk.apply(p, x, e6, ctx, cos, sin).astype(x.dtype), None
            x, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(x)

        blk_t[tag] = (timeit(f"block_fwd_{tag}", fwdK, p, x) - rt) / K
        del p

    # --- flash at the local length (to subtract) and the true Ulysses
    # per-device shape (5 heads @ 75.6k) ---
    t_fl_loc = flash_fwd_time(HEADS, L, rt, f"{HEADS}h_loc{L}_b{B}")
    t_fl_dev = flash_fwd_time(H_LOC, L_FULL, rt, f"{H_LOC}h_75k6_b{B}")
    # qk-int8 flash at the device shape (--quant_attn int8): the qk^T
    # matmul runs on the int8 MXU with per-head q/k scales inside the
    # kernel; measured 1.16x the bf16 bounded kernel at this shape
    # (scripts/profile_flash_qk8.py; max|diff| 2.4e-4 = bf16-ulp scale)
    t_fl_dev_qk8 = flash_fwd_time(H_LOC, L_FULL, rt,
                                  f"{H_LOC}h_75k6_b{B}_qk8", qk_int8=True)

    # --- embeds + head (i2v: 36-ch patch embed + CLIP MLPProj) ---
    emb_cfg = wan_dit.WanConfig(model_type="i2v", in_dim=36, dim=DIM,
                                ffn_dim=FFN, num_heads=HEADS, num_layers=0,
                                remat=False)
    model0 = wan_dit.WanModel(emb_cfg)
    lat = jnp.ones((B, 21, 90, 160 // SP, 16), jnp.float32)
    y_cond = jnp.ones((B, 21, 90, 160 // SP, 20), jnp.float32)
    txt = jnp.ones((B, 512, 4096), jnp.float32) * 0.1
    clip_fea = jnp.ones((B, 257, 1280), jnp.float32) * 0.1
    t_in = jnp.full((B,), 500.0, jnp.float32)
    p0 = model0.init(jax.random.PRNGKey(1), lat, t_in, txt, y=y_cond,
                     clip_fea=clip_fea)

    @jax.jit
    def embK(p, lat):
        def body(lat, _):
            o = model0.apply(p, lat, t_in, txt, y=y_cond, clip_fea=clip_fea)
            return o[..., :16].astype(lat.dtype), None
        lat, _ = jax.lax.scan(body, lat, None, length=K)
        return jnp.sum(lat)

    t_emb = max(0.0, (timeit("embeds_head_fwd", embK, p0, lat) - rt) / K)

    # --- UniPC solver step on the local latent shard ---
    from hyvideo_prfl_tpu.schedulers import unipc

    sched = unipc.unipc_schedule(STEPS, shift=5.0)
    lat1 = lat[:1]  # solver state is the single (cond) latent

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

    t_solver = max(0.0, (timeit("solver8", solverK, jnp.ones_like(lat1),
                                lat1) - rt) / 8)
    return blk_t, t_fl_loc, t_fl_dev, t_fl_dev_qk8, t_emb, t_solver


def main():
    out_path = os.environ.get("HYV_BENCH_SERVING_PATH") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SERVING.json")
    vae_decode = None
    if os.path.exists(out_path):
        with open(out_path) as f:
            vae_decode = json.load(f).get("vae_decode")
    if "--recompose" in sys.argv:
        # rebuild the composition from the last run's measured components
        # (no chip access) — used when COMM_AUDIT gains rows after the
        # measurement pass (e.g. the *_async recompiles land later)
        with open(out_path) as f:
            prev = json.load(f)
        blk_t = {"bf16": prev["block_fwd_local_bf16_ms"] / 1e3,
                 "int8": prev["block_fwd_local_int8_ms"] / 1e3}
        t_fl_loc = prev["flash_fwd_40h_9k45_b2_ms"] / 1e3
        t_fl_dev = prev["flash_fwd_5h_75k6_b2_ms"] / 1e3
        qk8_ms = prev.get("flash_fwd_5h_75k6_b2_qk8_ms")
        t_fl_dev_qk8 = qk8_ms / 1e3 if qk8_ms is not None else None
        t_emb = prev["embeds_head_fwd_ms"] / 1e3
        t_solver = prev["solver_step_ms"] / 1e3
    else:
        (blk_t, t_fl_loc, t_fl_dev, t_fl_dev_qk8, t_emb,
         t_solver) = _measure()

    # --- compiler-grounded per-chain communication (COMM_AUDIT.json) ---
    audit_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COMM_AUDIT.json")
    comm = {}
    if os.path.exists(audit_path):
        with open(audit_path) as fobj:
            stages = json.load(fobj).get("stages", {})
        # torus-aware pricing when the audit carries it (VERDICT r4 next
        # #6): uly8's 8-wide a2a groups span both v5e torus axes and ride
        # 2 rings — the single-axis model overprices exactly this layout
        # (and cannot separate it from ring2 x uly4)
        def row_of(st):
            return {
                "total_s": stages[st].get("total_seconds_torus",
                                          stages[st]["total_seconds"]),
                "overlappable_s": stages[st].get(
                    "async_overlappable_seconds_torus",
                    stages[st]["async_overlappable_seconds"]),
                "wire_model": ("torus" if "total_seconds_torus" in stages[st]
                               else "single_axis"),
            }

        for tag, st in (("bf16", "usp_uly8"), ("int8", "usp_uly8_int8")):
            if st in stages:
                comm[tag] = row_of(st)
                # the head-chunked async recompile (HYV_ULYSSES_CHUNKS)
                # turns the sync a2a tail into overlappable start/done
                # pairs — the recommended serving config
                if st + "_async" in stages:
                    comm[tag]["async"] = row_of(st + "_async")

    # --- composition + useful-FLOPs accounting (per device, per fwd) ---
    # dense: self qkvo (4 D^2 L) + cross q,o (2 D^2 L) + cross k,v/k_img,
    # v_img on the replicated 769-token context + ffn (2 D FFN L), batch B;
    # attention: full-sequence self at local heads + local-q cross.
    dense_f = 2.0 * B * (6 * DIM * DIM * L + 4 * DIM * DIM * CTX
                         + 2 * DIM * FFN * L)
    attn_f = 2.0 * B * (2 * L_FULL * L_FULL * (DIM / SP)
                        + 2 * L * CTX * DIM)
    blk_f = dense_f + attn_f
    fwd_f = LAYERS * blk_f
    chain_f = STEPS * fwd_f

    out = {"topology": "8 x v5e, pure Ulysses sp=8 (uly8)",
           "workload": "14B i2v 720p x 81f, UniPC-40, batched CFG",
           "teacache": "off (worst case)",
           "block_fwd_local_bf16_ms": round(blk_t["bf16"] * 1e3, 1),
           "block_fwd_local_int8_ms": round(blk_t["int8"] * 1e3, 1),
           "flash_fwd_40h_9k45_b2_ms": round(t_fl_loc * 1e3, 1),
           "flash_fwd_5h_75k6_b2_ms": round(t_fl_dev * 1e3, 1),
           "embeds_head_fwd_ms": round(t_emb * 1e3, 1),
           "solver_step_ms": round(t_solver * 1e3, 2)}
    if t_fl_dev_qk8 is not None:
        out["flash_fwd_5h_75k6_b2_qk8_ms"] = round(t_fl_dev_qk8 * 1e3, 1)
    suspicious = []
    # "int8_qk8" = the full opt-in quant config (--quant int8 --quant_attn
    # int8): W8A8 dense + the qk^T matmul on the int8 MXU. Collectives are
    # the int8 stage's (quantization lives inside the kernel; a2a shapes
    # unchanged), so it reuses the usp_uly8_int8 audit rows.
    tags = [("bf16", "bf16", t_fl_dev), ("int8", "int8", t_fl_dev)]
    if t_fl_dev_qk8 is not None:
        tags.append(("int8_qk8", "int8", t_fl_dev_qk8))
    for tag, blk_tag, t_fl in tags:
        blk_dev = blk_t[blk_tag] - t_fl_loc + t_fl
        t_fwd = LAYERS * blk_dev + t_emb
        chain = STEPS * (t_fwd + t_solver)
        tflops = chain_f / chain / 1e12
        row = {"block_fwd_dev_ms": round(blk_dev * 1e3, 1),
               "model_fwd_s": round(t_fwd, 3),
               "chain_compute_s": round(chain, 1),
               "chain_tflops_per_chip": round(tflops, 1),
               "chain_mfu_pct_v5e_bf16peak": round(100 * tflops / 197, 1)}
        if (tag if tag in comm else blk_tag) in comm:
            c = comm[tag if tag in comm else blk_tag]
            row["comm_audit_chain_s"] = round(c["total_s"], 1)
            row["comm_overlappable_s"] = round(c["overlappable_s"], 1)
            row["comm_wire_model"] = c["wire_model"]
            # full overlap can only hide comm under compute; the sync
            # residue (total - overlappable) always adds
            def interval(cc):
                sync = cc["total_s"] - cc["overlappable_s"]
                return [round(max(chain, cc["overlappable_s"]) + sync, 1),
                        round(chain + cc["total_s"], 1)]
            row["chain_interval_s"] = interval(c)
            if "async" in c:
                row["chain_interval_chunked_async_s"] = interval(c["async"])
        out[tag] = row
        if tflops > 197 * (1.0 if tag == "bf16" else 2.0):
            suspicious.append(f"{tag} rate above hardware peak")
    out["int8_speedup_compute"] = round(
        out["bf16"]["chain_compute_s"] / out["int8"]["chain_compute_s"], 3)
    if "int8_qk8" in out:
        out["int8_qk8_speedup_compute"] = round(
            out["bf16"]["chain_compute_s"]
            / out["int8_qk8"]["chain_compute_s"], 3)
    if vae_decode is not None:
        # once-per-clip tail: the W/8 per-device slice is the 8-chip
        # spatial-sharded production decode (VAEConfig.spatial_shard; the
        # conv halo exchange moves a few rows per chunk — negligible wire),
        # run after the sampling chain on the same slice
        out["vae_decode"] = vae_decode
        cands = [vae_decode.get("decode_720p81f_Wshard8_dev_fp32_s"),
                 vae_decode.get("decode_720p81f_Wshard8_dev_bf16_s")]
        cands = [c for c in cands if c is not None]
        tail = min(cands) if cands else None
        if tail is not None:
            for tag in ("bf16", "int8", "int8_qk8"):
                if tag not in out:
                    continue
                row = out[tag]
                key = ("chain_interval_chunked_async_s"
                       if "chain_interval_chunked_async_s" in row
                       else "chain_interval_s")
                if key in row:
                    row["end_to_end_with_decode_s"] = [
                        round(v + tail, 1) for v in row[key]]
    if suspicious or blk_t["int8"] >= blk_t["bf16"]:
        out["suspect_contention"] = suspicious or ["int8 slower than bf16"]
        print(json.dumps({"warning": "timings look contended; rerun",
                          "reasons": out["suspect_contention"]}), flush=True)
    print(json.dumps(out), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
