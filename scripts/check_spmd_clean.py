"""Compile the hot multi-chip graphs and report SPMD involuntary-full-
rematerialization warnings (VERDICT r3 Weak #1).

XLA's SPMD partitioner prints "[SPMD] Involuntary full rematerialization"
to stderr whenever it cannot transform one sharding into another and falls
back to replicate-then-slice — at the 14B 720p scale that is a ~77 MB
replicated tensor per occurrence PER STEP inside the sampling/rollout scans.
This harness compiles each stage on a virtual 8-device CPU mesh at shapes
whose latent frame count does NOT divide sp (the realistic 4n+1 case) and
counts the warnings, so the boundary-layout discipline is regression-pinned
(tests/test_spmd_clean.py runs it as a subprocess and asserts zero).

Stages:
  refl   — PRFL refl train step (rollout scan + LRM) on the (data, sp) mesh
  refl_hybrid — the same under hybrid_full FSDP (params sharded on "sp"
         only; caught the rope-table involuntary-remat family)
  sft    — flow-matching SFT step
  usp    — USP (ring x ulysses) CFG sampling scan
  teacache — TeaCache sampling scan (lax.cond skip + residual caches)

Usage: python scripts/check_spmd_clean.py [stage ...]  (default: all)
Prints one line per stage: `stage <name>: <n> involuntary-remat warnings`.
"""

import os
import subprocess
import sys

STAGES = ("refl", "refl_hybrid", "sft", "usp", "teacache")


def _child(stage: str) -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.parallel import sharding as shd
    from hyvideo_prfl_tpu.training import common

    n = jax.device_count()
    assert n >= 8, f"need 8 virtual devices, got {n}"

    if stage in ("refl", "refl_hybrid", "sft"):
        from hyvideo_prfl_tpu.schedulers import flow_match as fm
        from hyvideo_prfl_tpu.training.pavrm import PavrmConfig
        from hyvideo_prfl_tpu.training.prfl import (
            PrflConfig, PrflModel, make_refl_step, make_sft_step,
        )

        sp, data = 4, 2
        mesh = shd.make_mesh(data=data, sp=sp)
        policy = shd.ShardingPolicy()
        # refl_hybrid uses a LEGAL Ulysses ratio (num_heads % sp == 0, the
        # reference's own assert): heads=2 < sp=4 makes SPMD invent padded
        # head shardings for the RoPE-table broadcasts and involuntarily
        # rematerialize — an artifact of the illegal test ratio, not of the
        # hybrid_full layout (heads=4 compiles with zero warnings)
        dit_cfg = wan_dit.tiny_test(
            remat=True, num_heads=4 if stage == "refl_hybrid" else 2)
        model = PrflModel(
            dit_cfg, PavrmConfig(loss="ce", feature_layer=(2,)),
            PrflConfig(inference_steps=4, flow_shift=3.0), policy)
        params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
        tx = common.make_optimizer(learning_rate=1e-5)
        # f = 5 (4n+1, NOT divisible by sp) — the realistic latent frame
        # count; tokens = 5*4*8 = 160 divide sp via the W axis
        b, f, h, w = data, 5, 8, 16
        batch = {
            "latents": jnp.zeros((b, f, h, w, 16), jnp.float32),
            "text": jnp.zeros((b, dit_cfg.text_len, dit_cfg.text_dim),
                              jnp.float32),
        }
        strategy = "hybrid_full" if stage == "refl_hybrid" else "full"
        with jax.set_mesh(mesh):
            pshard = shd.fsdp_param_sharding(mesh, params, min_size=1024,
                                             strategy=strategy)
            params_s = jax.device_put(params, pshard)
            state = common.init_train_state(params_s, tx)
            batch_s = {
                "latents": jax.device_put(
                    batch["latents"],
                    NamedSharding(mesh, P("data", None, None, "sp"))),
                "text": jax.device_put(
                    batch["text"], NamedSharding(mesh, P("data"))),
            }
            if stage in ("refl", "refl_hybrid"):
                lrm_t, lrm_f = model.lrm.init_all(jax.random.PRNGKey(1))
                lrm_tower = {
                    "dit": common.merge_tree(
                        {"params": {"blocks": lrm_t["blocks"]}}, lrm_f),
                    "q": {"params": lrm_t["q_attn"]},
                    "m": {"params": lrm_t["mlp"]},
                }
                step = jax.jit(make_refl_step(model, tx))
                step.lower(state, batch_s, jax.random.PRNGKey(2),
                           lrm_tower).compile()
            else:
                step = jax.jit(make_sft_step(model, tx,
                                             fm.train_schedule(1000)))
                step.lower(state, batch_s, jax.random.PRNGKey(3)).compile()
        return

    if stage == "usp":
        from hyvideo_prfl_tpu.pipelines.pipeline import (
            GenerateConfig, WanT2V,
        )

        cfg = wan_dit.WanConfig(
            dim=256, ffn_dim=512, num_heads=2, num_layers=2, freq_dim=32,
            text_dim=64, remat=False)
        mesh = shd.make_usp_mesh(data=2, ring=2, ulysses=2,
                                 devices=jax.devices()[:8])
        params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
        with jax.set_mesh(mesh):
            pipe = WanT2V(cfg, params, shd.usp_policy())
            ctx1 = jnp.zeros((1, cfg.text_len, cfg.text_dim))
            # exactly the r3 dryrun shape that produced the 3 warnings:
            # f=2 (divides ring), b=1, 2 steps — SPMD tried to shard the
            # unpatchify grid dims and fell back to full rematerialization
            fn = jax.jit(lambda rng, c, cn: pipe.generate(
                rng, c, cn, 2, 16, 16, GenerateConfig(sampling_steps=2)))
            fn.lower(jax.random.PRNGKey(1), ctx1, ctx1).compile()
            # and the realistic 4n+1 frame count (f=5, NOT divisible)
            ctx2 = jnp.zeros((2, cfg.text_len, cfg.text_dim))
            fn2 = jax.jit(lambda rng, c, cn: pipe.generate(
                rng, c, cn, 5, 8, 16, GenerateConfig(sampling_steps=4)))
            fn2.lower(jax.random.PRNGKey(1), ctx2, ctx2).compile()
        return

    if stage == "teacache":
        sp, data = 4, 2
        mesh = shd.make_mesh(data=data, sp=sp)
        from hyvideo_prfl_tpu.pipelines.pipeline import (
            GenerateConfig, WanPipeline,
        )

        cfg = wan_dit.tiny_test(remat=False)
        params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
        with jax.set_mesh(mesh):
            pipe = WanPipeline(cfg, params, shd.ShardingPolicy())
            ctx = jnp.zeros((data, cfg.text_len, cfg.text_dim))
            fn = jax.jit(lambda rng, c, cn: pipe.sample_teacache(
                rng, (data, 5, 8, 16, 16), c, cn,
                GenerateConfig(sampling_steps=4), thresh=0.1,
                coeffs_key="t2v-1.3b"))
            fn.lower(jax.random.PRNGKey(1), ctx, ctx).compile()
        return

    raise SystemExit(f"unknown stage {stage}")


def run_stage(stage: str) -> int:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from scripts.check_spmd_clean import _child; _child(%r)"
        % (repo, stage)
    )
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError(f"stage {stage} failed rc={r.returncode}")
    n_warn = r.stderr.count("Involuntary full rematerialization")
    print(f"stage {stage}: {n_warn} involuntary-remat warnings")
    if n_warn and os.environ.get("SPMD_VERBOSE"):
        for line in r.stderr.splitlines():
            if "Involuntary" in line:
                print("  " + line[:300])
    return n_warn


def main(argv):
    stages = argv[1:] or list(STAGES)
    total = 0
    for s in stages:
        total += run_stage(s)
    print(f"TOTAL: {total}")
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
