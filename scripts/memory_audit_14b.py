"""14B i2v PRFL step memory budget on a chipless v5p AOT topology.

Compiles the REAL multi-chip program — Mosaic-lowered flash-attention and
qknorm_rope kernels (PALLAS_INTERPRET=0), FSDP + sequence-parallel GSPMD
shardings, donated train state — for a v5p 2x2x2 (8-chip) topology without
any TPU attached, and reports `compiled.memory_analysis()` per device
against the v5p HBM budget (95 GB/chip).

This is the deliverable VERDICT r1 item 6 asked for: documented
bytes-per-device for the 2x4-equivalent mesh 14B i2v step with the flash
path engaged, plus a remat-policy and host-offload sweep.

Usage:
    python scripts/memory_audit_14b.py [--policy full|dots] [--offload]
(it re-execs itself with the required env when launched under the axon
backend).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPMD_REMAT_PATTERN = "Involuntary full rematerialization"


@contextlib.contextmanager
def count_spmd_warnings(res: dict):
    """Count the SPMD partitioner's C++ stderr warnings during compile
    (VERDICT r4 next #4: pin zero involuntary-remat at the REAL 14B
    shapes, not just the dim-128 proxies of check_spmd_clean.py). The
    partitioner writes to fd 2 directly, so Python-level sys.stderr
    redirection cannot see it — dup the fd over a temp file, restore,
    scan, and replay so nothing is hidden."""
    tmp = tempfile.TemporaryFile(mode="w+")
    sys.stderr.flush()
    saved = os.dup(2)
    os.dup2(tmp.fileno(), 2)
    try:
        yield res
    finally:
        sys.stderr.flush()
        os.dup2(saved, 2)
        os.close(saved)
        tmp.seek(0)
        text = tmp.read()
        tmp.close()
        res["spmd_involuntary_remat_warnings"] = (
            res.get("spmd_involuntary_remat_warnings", 0)
            + text.count(SPMD_REMAT_PATTERN))
        sys.stderr.write(text)
        sys.stderr.flush()


def _ensure_env():
    need = {
        "JAX_PLATFORMS": "cpu",
        "TPU_ACCELERATOR_TYPE": "v5p-16",
        "TPU_WORKER_HOSTNAMES": "localhost",
        "PALLAS_INTERPRET": "0",
        # the chipless AOT compiler has no emitter for custom_partitioning
        # callbacks: route self-attention through shard_map (real Mosaic
        # flash kernel) and the qk-norm through unfused XLA (upper bound)
        "HYV_NO_CUSTOM_PARTITIONING": "1",
    }
    if all(os.environ.get(k) == v for k, v in need.items()) and \
            "PALLAS_AXON_POOL_IPS" not in os.environ:
        return
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(need)
    r = subprocess.run([sys.executable, os.path.abspath(__file__)]
                       + sys.argv[1:], env=env)
    sys.exit(r.returncode)


def inference_audit():
    """Serving-path budget: the full 14B i2v CFG sampling chain (UniPC-40,
    720p x 81f = 75,600 tokens) under USP ring=2 x ulysses=4, bf16 weights
    FSDP-sharded over a chipless 8-chip v5e topology (16 GB HBM/chip)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.parallel import sharding as shd
    from hyvideo_prfl_tpu.schedulers import unipc

    try:
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x4")
        hbm_gb, name = 16, "v5e:2x4"
    except Exception:
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5p:2x2x2")
        hbm_gb, name = 16, "v5p:2x2x2 (v5e budget)"
    mesh = Mesh(np.array(topo.devices).reshape(1, 2, 4),
                ("data", "ring", "sp"))
    print(f"topology {name} -> mesh data=1 ring=2 ulysses=4", flush=True)

    cfg = wan_dit.i2v_14b(remat=False)
    policy = shd.usp_policy()
    model = wan_dit.WanModel(cfg, policy)

    pshapes = jax.eval_shape(
        lambda: wan_dit.init_params(cfg, jax.random.PRNGKey(0)))
    # inference weights in bf16 (reference shard_model, fsdp.py:10-32)
    pshapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), pshapes)
    pshard = shd.fsdp_param_sharding(mesh, pshapes, min_size=2 ** 16)
    params_abs = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        pshapes, pshard)

    b, f, hh, ww = 1, 21, 90, 160  # 720p x 81 frames -> 75,600 tokens
    seq = ("ring", "sp")
    wsh = NamedSharding(mesh, P("data", None, None, seq, None))
    bsh = NamedSharding(mesh, P("data"))
    lat_abs = jax.ShapeDtypeStruct((b, f, hh, ww, 16), jnp.float32,
                                   sharding=wsh)
    y_abs = jax.ShapeDtypeStruct((b, f, hh, ww, 20), jnp.float32,
                                 sharding=wsh)
    txt_abs = jax.ShapeDtypeStruct((b, cfg.text_len, cfg.text_dim),
                                   jnp.float32, sharding=bsh)
    clip_abs = jax.ShapeDtypeStruct((b, 257, 1280), jnp.float32,
                                    sharding=bsh)

    sched = unipc.unipc_schedule(40, shift=5.0)

    def sample(params, noise, text, text_null, y, clip_fea):
        def vel(x, t):
            x2 = jnp.concatenate([x, x], axis=0)
            ctx2 = jnp.concatenate([text, text_null], axis=0)
            t2 = jnp.broadcast_to(jnp.atleast_1d(t), (b,))
            t2 = jnp.concatenate([t2, t2], axis=0)
            y2 = jnp.concatenate([y, y], axis=0)
            clip2 = jnp.concatenate([clip_fea, clip_fea], axis=0)
            out = model.apply(params, x2, t2, ctx2, y=y2, clip_fea=clip2)
            cond, uncond = out[:b], out[b:]
            return uncond + 5.0 * (cond - uncond)

        x, _ = unipc.rollout(sched, vel, noise)
        return x

    warn = {}
    with count_spmd_warnings(warn):
        with jax.set_mesh(mesh):
            jitted = jax.jit(sample)
            print("lowering...", flush=True)
            lowered = jitted.lower(params_abs, lat_abs, txt_abs, txt_abs,
                                   y_abs, clip_abs)
            print("compiling...", flush=True)
            compiled = lowered.compile()
    ma = compiled.memory_analysis()
    import json

    live = (ma.argument_size_in_bytes - ma.alias_size_in_bytes
            + ma.output_size_in_bytes + ma.temp_size_in_bytes)
    print(json.dumps({
        "mode": "inference_usp_ring2_ulysses4",
        "tokens": f * (hh // 2) * (ww // 2),
        "args_gb": round(ma.argument_size_in_bytes / 2 ** 30, 2),
        "temp_gb": round(ma.temp_size_in_bytes / 2 ** 30, 2),
        "out_gb": round(ma.output_size_in_bytes / 2 ** 30, 2),
        "hbm_peak_gb_per_device": round(live / 2 ** 30, 2),
        "hbm_budget_gb": hbm_gb,
        "fits": bool(live / 2 ** 30 < hbm_gb),
        **warn,
    }), flush=True)
    return 0


def main():
    _ensure_env()
    p = argparse.ArgumentParser()
    p.add_argument("--policy", default="full",
               choices=["full", "dots", "attn"])
    p.add_argument("--offload", action="store_true",
                   help="pinned-host out-shardings for the optimizer state")
    p.add_argument("--ema", action="store_true",
                   help="include the model.ema.use_ema row: the EMA tree "
                        "(a second full fp32 param copy, sharded like the "
                        "params — training/ema.ema_init pins this) is HBM-"
                        "resident through every step, and its donated jitted "
                        "update (ema.make_ema_update) compiles on the same "
                        "topology. All 720p reference configs enable EMA.")
    p.add_argument("--rollout", type=int, default=40)
    p.add_argument("--accum", type=int, default=1,
                   help="train.gradient_accumulation_steps: the reference's "
                        "flagship 720p PRFL config trains with 5 "
                        "(train_prfl_i2v_720.yaml:80). The cond-gated "
                        "accumulation transform (training/common.py) holds "
                        "a param-sized fp32 acc_grads tree whose leaves "
                        "take the params' FSDP shardings (pinned by "
                        "tests/test_fsdp_strategies.py) and stay "
                        "DEVICE-resident even under the pinned-host "
                        "moment offload — the accumulator is read+written "
                        "every micro-step (parallel/sharding.py).")
    p.add_argument("--inference", action="store_true",
                   help="serving audit instead: the 14B i2v CFG sampling "
                        "chain (720p x 81f, UniPC-40) under USP ring=2 x "
                        "ulysses=4 on a chipless v5e-8 topology, bf16 "
                        "weights (the reference's inference FSDP dtype, "
                        "fsdp.py:10-32)")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.parallel import sharding as shd
    from hyvideo_prfl_tpu.training import common
    from hyvideo_prfl_tpu.training.pavrm import PavrmConfig
    from hyvideo_prfl_tpu.training.prfl import PrflConfig, PrflModel, \
        make_refl_step

    if args.inference:
        return inference_audit()

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5p:2x2x2")
    mesh = Mesh(np.array(topo.devices).reshape(2, 4), ("data", "sp"))
    print(f"topology v5p:2x2x2 -> mesh data=2 sp=4", flush=True)

    cfg = wan_dit.i2v_14b(remat=True, remat_policy=args.policy)
    # shard_map Ulysses: the per-device Pallas flash kernel compiles under
    # the AOT topology (GSPMD custom_partitioning does not)
    policy = shd.ShardingPolicy(shard_map_ulysses=True)
    pc = PavrmConfig(loss="ce", feature_layer=(20,), trainable_blocks=())
    prfl_cfg = PrflConfig(inference_steps=args.rollout, flow_shift=5.0,
                          is_i2v=True, fixed_mid=args.rollout - 2)
    model = PrflModel(cfg, pc, prfl_cfg, policy)

    # abstract shapes only — nothing is materialized
    pshapes = jax.eval_shape(
        lambda: wan_dit.init_params(cfg, jax.random.PRNGKey(0)))
    pshard = shd.fsdp_param_sharding(mesh, pshapes, min_size=2 ** 16)

    def sds(shape_dtype, sharding):
        return jax.ShapeDtypeStruct(shape_dtype.shape, shape_dtype.dtype,
                                    sharding=sharding)

    params_abs = jax.tree.map(sds, pshapes, pshard)

    tx = common.make_optimizer(learning_rate=1e-6,
                               gradient_accumulation_steps=args.accum)
    opt_shapes = jax.eval_shape(tx.init, pshapes)
    opt_dev, opt_host = shd.opt_state_shardings(mesh, pshapes, pshard, tx)
    opt_transfer = (opt_dev, opt_host) if args.offload else None
    opt_abs = jax.tree.map(sds, opt_shapes,
                           opt_host if args.offload else opt_dev)
    state_abs = common.TrainState(
        params=params_abs, opt_state=opt_abs,
        step=jax.ShapeDtypeStruct((), jnp.int32,
                                  sharding=NamedSharding(mesh, P())))

    # 720p x 81 frames i2v latents: [1, 21, 90, 160, 16] -> 75,600 tokens
    b, f, hh, ww = 2, 21, 90, 160
    bsh = NamedSharding(mesh, P("data"))
    wsh = NamedSharding(mesh, P("data", None, None, "sp", None))
    batch_abs = {
        "latents": jax.ShapeDtypeStruct((b, f, hh, ww, 16), jnp.float32,
                                        sharding=wsh),
        "cond": jax.ShapeDtypeStruct((b, f, hh, ww, 16), jnp.float32,
                                     sharding=wsh),
        "clip_fea": jax.ShapeDtypeStruct((b, 257, 1280), jnp.float32,
                                         sharding=bsh),
        "text": jax.ShapeDtypeStruct((b, cfg.text_len, cfg.text_dim),
                                     jnp.float32, sharding=bsh),
    }

    lrm_cfg = model.lrm.dit_cfg
    lrm_shapes = jax.eval_shape(
        lambda: wan_dit.init_params(lrm_cfg, jax.random.PRNGKey(1)))
    lrm_shapes = {"params": {k: v for k, v in lrm_shapes["params"].items()
                             if k != "head"}}
    lrm_shard = shd.fsdp_param_sharding(mesh, lrm_shapes, min_size=2 ** 16)
    lrm_abs = jax.tree.map(sds, lrm_shapes, lrm_shard)
    q_abs, m_abs = jax.eval_shape(model.lrm.init_head_params,
                                  jax.random.PRNGKey(2))
    rep = NamedSharding(mesh, P())
    q_abs = jax.tree.map(lambda s: sds(s, rep), q_abs)
    m_abs = jax.tree.map(lambda s: sds(s, rep), m_abs)
    lrm_tower_abs = {"dit": lrm_abs, "q": q_abs, "m": m_abs}

    refl = make_refl_step(model, tx, opt_transfer=opt_transfer)
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)

    warn = {}
    with count_spmd_warnings(warn):
        with jax.set_mesh(mesh):
            jitted = jax.jit(refl, donate_argnums=(0,))
            print("lowering...", flush=True)
            lowered = jitted.lower(state_abs, batch_abs, rng_abs,
                                   lrm_tower_abs)
            print("compiling...", flush=True)
            compiled = lowered.compile()
    ma = compiled.memory_analysis()
    # CompiledMemoryStats sizes are PER DEVICE (the SPMD executable is
    # per-device): the measured argument bytes match the sharded
    # params+opt+LRM expectation (~27 GB/device at 14B over 8 chips)
    per_dev = {
        "policy": args.policy,
        "offload": args.offload,
        "rollout": args.rollout,
        "gradient_accumulation_steps": args.accum,
        "args_gb": round(ma.argument_size_in_bytes / 2 ** 30, 2),
        "out_gb": round(ma.output_size_in_bytes / 2 ** 30, 2),
        "donated_gb": round(ma.alias_size_in_bytes / 2 ** 30, 2),
        "temp_gb": round(ma.temp_size_in_bytes / 2 ** 30, 2),
        "host_args_gb": round(ma.host_argument_size_in_bytes / 2 ** 30, 2),
        "host_temp_gb": round(ma.host_temp_size_in_bytes / 2 ** 30, 2),
        "code_mb": round(ma.generated_code_size_in_bytes / 2 ** 20, 1),
    }
    # live HBM peak ~= args + outputs + temps - donated (aliased in-place)
    live = (ma.argument_size_in_bytes - ma.alias_size_in_bytes
            + ma.output_size_in_bytes + ma.temp_size_in_bytes)
    per_dev["ema"] = args.ema
    if args.ema:
        # the EMA tree (training/ema.py: ema_init pins it onto the params'
        # FSDP shardings) is a resident buffer during the refl step — it is
        # not an argument of that executable, so memory_analysis() cannot
        # see it; account it analytically from the shardings.
        def _dev_bytes(s, sh):
            n = 1
            for part in sh.spec:
                if part is None:
                    continue
                for a in (part if isinstance(part, tuple) else (part,)):
                    n *= mesh.shape[a]
            return s.size * s.dtype.itemsize // n

        ema_bytes = sum(_dev_bytes(s, sh) for s, sh in zip(
            jax.tree.leaves(pshapes), jax.tree.leaves(pshard)))
        per_dev["ema_resident_gb_per_device"] = round(ema_bytes / 2 ** 30, 2)
        live += ema_bytes
        # compile the donated EMA update itself on the topology: it aliases
        # the EMA tree in place, so its own temp footprint must be ~0
        from hyvideo_prfl_tpu.training import ema as ema_mod

        ema_abs = jax.tree.map(sds, pshapes, pshard)
        with jax.set_mesh(mesh):
            ema_fn = ema_mod.make_ema_update(pshard, decay=0.999)
            ema_ma = ema_fn.lower(ema_abs, params_abs).compile() \
                           .memory_analysis()
        per_dev["ema_update_temp_gb"] = round(
            ema_ma.temp_size_in_bytes / 2 ** 30, 3)
        per_dev["ema_update_donated_gb"] = round(
            ema_ma.alias_size_in_bytes / 2 ** 30, 2)
    per_dev["hbm_peak_gb_per_device"] = round(live / 2 ** 30, 2)
    per_dev["v5p_hbm_gb"] = 95
    per_dev["fits"] = bool(live / 2 ** 30 < 95)
    per_dev.update(warn)
    print(json.dumps(per_dev), flush=True)


if __name__ == "__main__":
    main()
