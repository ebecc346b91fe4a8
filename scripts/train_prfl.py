"""PRFL post-training CLI.

Usage parity with the reference (scripts/prfl/train_prfl.py:1190-1199):

    python scripts/train_prfl.py --config_path configs/train_prfl_i2v_720.yaml

Every outer step runs the PRFL reward step AND the flow-matching SFT step
(reference main loop, train_prfl.py:1130-1185), both as single jitted
computations over the (data, sp) mesh.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts._common import (
    MetricLogger, StepTimer, build_mesh, dit_cfg_from, fetch_full,
    fsdp_strategy_from, make_sharded_state, make_train_loader,
)
from hyvideo_prfl_tpu.configs import load_config
from hyvideo_prfl_tpu.data.dataset import LatentCacheDataset
from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.parallel import sharding as shd
from hyvideo_prfl_tpu.schedulers import flow_match as fm
from hyvideo_prfl_tpu.training import common, ema as ema_mod, lora as lora_mod
from hyvideo_prfl_tpu.training.pavrm import PavrmConfig
from hyvideo_prfl_tpu.training.prfl import (
    PrflConfig, PrflModel, make_refl_step, make_sft_step,
)
from hyvideo_prfl_tpu.utils import checkpoint as ck


def main(config, max_steps=None):
    if config.train.get("debug_nans"):
        # the jax analog of torch.autograd.set_detect_anomaly
        # (train_pavrm.py:1319) — expensive, opt-in via train.debug_nans
        jax.config.update("jax_debug_nans", True)
    out_dir = os.path.join(config.save.output_dir, config.train_id)
    os.makedirs(out_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO)
    logger = MetricLogger(config.save.log_dir or os.path.join(out_dir, "logs"))

    mesh = build_mesh(config)
    is_i2v = "i2v" in config.task or "flf2v" in config.task
    dit_cfg = dit_cfg_from(config)

    pc = PavrmConfig(
        loss=config.lrm.get("loss", "ce"),
        pool=config.lrm.pool,
        feature_layer=tuple(config.lrm.feature_layer),
        trainable_blocks=tuple(config.lrm.trainable_blocks),
        num_queries=config.lrm.query_attention.num_queries,
        num_heads=config.lrm.query_attention.num_heads,
        return_type=config.lrm.query_attention.return_type,
    )
    prfl_cfg = PrflConfig(
        inference_steps=int(config.get("prfl_inference_steps", 40)),
        flow_shift=config.extra_model.scheduler.flow_shift,
        num_train_timesteps=config.extra_model.scheduler.num_train_timesteps,
        weighting_scheme=config.extra_model.scheduler.weighting_scheme,
        logit_mean=config.extra_model.scheduler.logit_mean,
        logit_std=config.extra_model.scheduler.logit_std,
        is_i2v=is_i2v,
        is_flf2v="flf2v" in config.task,
        # debug/dynamics knob: pin the rollout-truncation timestep so the
        # reward metric is comparable across steps (tests/learning curves)
        fixed_mid=(int(config.train.fixed_mid)
                   if config.train.get("fixed_mid") is not None else None),
        # opt-in: int8 no-grad rollout (W8A8 dense + qk-int8 flash for the
        # stop_gradient rollout forwards only; see PrflConfig.rollout_quant)
        rollout_quant=config.train.get("rollout_quant"),
    )
    policy = shd.ShardingPolicy() if mesh.devices.size > 1 else None
    model = PrflModel(dit_cfg, pc, prfl_cfg, policy)

    rng = jax.random.PRNGKey(config.train.seed)

    # --- policy transformer params ---
    resume = config.model.resume_transformer_path
    base = config.model.init_transformer_path or config.model.base_path
    start_step = 0
    if resume and os.path.isdir(resume):
        logging.info("resuming policy from %s", resume)
        params = ck.load_wan_checkpoint(resume, dit_cfg)
        start_step = ck.parse_resume_step(resume)
    elif base and os.path.isdir(base):
        logging.info("loading policy base from %s", base)
        params = ck.load_wan_checkpoint(base, dit_cfg)
    else:
        logging.info("no base checkpoint; random init (smoke mode)")
        params = wan_dit.init_params(dit_cfg, rng)

    # --- frozen LRM tower (trimmed DiT + heads) ---
    lrm_path = config.model.lrm_transformer_path
    if lrm_path and os.path.isdir(lrm_path):
        import dataclasses
        import json

        logging.info("loading LRM transformer from %s", lrm_path)
        # the dir may hold the FULL policy-shaped transformer (released
        # reference layout) or the trimmed head-less tower train_pavrm.py
        # exports (the reference removes non-kept blocks + head before
        # save_checkpoint, train_pavrm.py:219-236, and loads strict=False,
        # train_prfl.py:260-263): read num_layers from its config.json
        n_lrm = model.lrm.dit_cfg.num_layers
        n_saved = dit_cfg.num_layers
        cfg_json = os.path.join(lrm_path, "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                n_saved = int(json.load(f).get("num_layers", n_saved))
        assert n_saved >= n_lrm, (
            f"LRM checkpoint at {lrm_path} has {n_saved} blocks < the "
            f"{n_lrm} the feature taps need")
        lrm_full = ck.load_wan_checkpoint(
            lrm_path, dataclasses.replace(dit_cfg, num_layers=n_saved))
        if n_saved > n_lrm:
            lrm_dit = common.slice_blocks(lrm_full, n_lrm)
        else:
            lrm_full["params"].pop("head", None)
            lrm_dit = lrm_full
        lq = ck.load_reward_head(
            config.model.lrm_query_attention_path, "qattn")["params"]
        lm = ck.load_reward_head(config.model.lrm_mlp_path, "mlp")["params"]
        lrm_q, lrm_m = {"params": lq}, {"params": lm}
    else:
        logging.info("no LRM checkpoint; random init (smoke mode)")
        lrm_trainable, lrm_frozen = model.lrm.init_all(jax.random.PRNGKey(1))
        lrm_dit = common.merge_tree(
            {"params": {"blocks": lrm_trainable["blocks"]}}, lrm_frozen)
        lrm_q = {"params": lrm_trainable["q_attn"]}
        lrm_m = {"params": lrm_trainable["mlp"]}

    use_lora = bool(config.model.lora.use_lora)
    tx = common.make_optimizer(
        learning_rate=config.optimizer.learning_rate,
        adam_beta1=config.optimizer.adam_beta1,
        adam_beta2=config.optimizer.adam_beta2,
        weight_decay=config.optimizer.weight_decay,
        lr_scheduler=config.optimizer.lr_scheduler,
        lr_warmup_steps=config.optimizer.lr_warmup_steps,
        lr_num_cycles=int(config.optimizer.get("lr_num_cycles", 1)),
        lr_power=float(config.optimizer.get("lr_power", 1.0)),
        max_train_steps=config.optimizer.max_train_steps,
        gradient_accumulation_steps=config.train.gradient_accumulation_steps,
    )
    # FSDP strategy (model.fsdp.fsdp_sharding_startegy [sic]) + CPU offload
    # (model.fsdp.use_cpu_offload maps to the opt-state pinned-host offload)
    fsdp_strategy = fsdp_strategy_from(config)
    offload = bool(config.train.get("offload_opt_state")
                   or config.get_path("model.fsdp.use_cpu_offload"))
    if use_lora:
        # freeze the base; train a LoRA tree (reference peft path,
        # train_prfl.py:320-333)
        lora_params = lora_mod.lora_init(
            jax.random.PRNGKey(config.train.seed + 1), params,
            rank=int(config.model.lora.lora_rank),
            target_modules=tuple(config.model.lora.target_modules),
        )
        state, opt_transfer, state_shardings = make_sharded_state(
            mesh, lora_params, tx, offload_opt=offload,
            strategy=fsdp_strategy)
    else:
        state, opt_transfer, state_shardings = make_sharded_state(
            mesh, params, tx, offload_opt=offload, strategy=fsdp_strategy)
    opt_resume = (os.path.join(resume, "opt_state")
                  if resume and not use_lora else None)
    if opt_resume and os.path.isdir(opt_resume):
        # exact resume: restore the AdamW moments written by
        # train.save_optimizer_state onto the live shardings. state.step
        # counts optimizer updates (refl + sft each increment, 2/loop
        # iteration) — resume it alongside the moments
        restored = ck.load_orbax(opt_resume, like=state.opt_state)
        if state_shardings is not None:
            restored = jax.device_put(restored, state_shardings.opt_state)
        state = state.replace(
            opt_state=restored,
            step=jnp.asarray(2 * start_step, jnp.int32))
        logging.info("restored optimizer state from %s", opt_resume)
    use_ema = config.model.ema.use_ema
    # EMA tracks whatever is being trained (LoRA tree or full params).
    # It rides the params' FSDP shardings and updates via ONE jitted
    # donated computation (VERDICT r3 weak #5: eager per-leaf host-thread
    # updates + an unaudited unsharded copy at 14B).
    ema_params = ema_fn = None
    if use_ema:
        ema_shardings = state_shardings.params if state_shardings else None
        ema_params = ema_mod.ema_init(state.params, ema_shardings)
        ema_fn = ema_mod.make_ema_update(ema_shardings,
                                         config.model.ema.ema_decay)

    dataset = LatentCacheDataset(
        "refl",
        meta_file_list=list(config.dataset.meta_file_list),
        uncond_prob=list(config.dataset.uncond_prob),
        text_len=config.extra_model.get_path("text_encoder.t5_text_len", 512),
        is_i2v=is_i2v,
        is_flf2v="flf2v" in config.task,
        null_dir=config.dataset.null_dir,
        seed=config.train.seed,
    )
    # raw resume step; make_train_loader wraps it into the per-replica
    # block exactly once (a second modulo here would shift the offset)
    loader = make_train_loader(config, dataset, mesh, start_index=start_step)

    refl_fn = make_refl_step(model, tx, lora_mode=use_lora,
                             opt_transfer=opt_transfer)
    if mesh.devices.size > 1:
        # frozen LRM tower rides the same FSDP layout as the policy
        lrm_dit = jax.device_put(
            lrm_dit, shd.fsdp_param_sharding(mesh, lrm_dit,
                                             strategy=fsdp_strategy))
    lrm_tower = {"dit": lrm_dit, "q": lrm_q, "m": lrm_m}
    if use_lora:
        lrm_tower["base"] = params
    sft_fn = make_sft_step(model, tx, fm.train_schedule(
        config.extra_model.scheduler.num_train_timesteps),
        lora_mode=use_lora, lora_base=params if use_lora else None,
        opt_transfer=opt_transfer)

    sanity_dir = config.save.sanity_check_dir or os.path.join(
        out_dir, "sanity_check")
    # in-process VAE decode on the training heap is unsafe on backends that
    # never release HBM buffers (CLAUDE.md axon hazard: a step-<=50 sanity
    # decode poisons the heap for every later refl step). Decode in a fresh
    # subprocess (scripts/decode_latents.py) when HYV_DECODE_SUBPROCESS=1 or
    # the remote-axon backend is registered — and in that mode never load
    # the VAE params in-process either (they'd pin HBM for nothing).
    decode_subproc = os.environ.get("HYV_DECODE_SUBPROCESS")
    if decode_subproc is None:
        decode_subproc = "PALLAS_AXON_POOL_IPS" in os.environ
    else:
        decode_subproc = decode_subproc not in ("", "0", "false")

    vae = vae_params = None
    vae_path = config.extra_model.get_path("vae.params_path")
    have_vae = bool(vae_path and os.path.exists(vae_path))
    if have_vae and not decode_subproc:
        from hyvideo_prfl_tpu.models import vae as vae_mod
        vae = vae_mod.WanVAE(vae_mod.VAEConfig())
        vae_params = ck.load_orbax(vae_path)

    def sanity_dump(step, m_refl):
        """rank0 pred_x0 / latent mp4 dumps, every sanity_check_interval
        steps within the first 50 (train_prfl.py:849-887). Off-cadence steps
        never fetch the latents to host."""
        interval = config.train.sanity_check_interval
        if interval <= 0 or step > 50 or step % interval != 0:
            return
        is_main = jax.process_index() == 0
        if is_main:
            os.makedirs(sanity_dir, exist_ok=True)
        for name in ("pred_x0", "latent_next"):
            # collective fetch on pods — run on every process, write on 0
            lat = np.asarray(fetch_full(m_refl[name]))
            if not is_main:
                continue
            if not have_vae:
                np.save(os.path.join(sanity_dir, f"step{step}_{name}.npy"),
                        lat)
            elif decode_subproc:
                import subprocess
                lat_file = os.path.join(sanity_dir,
                                        f"step{step}_{name}_latents.npy")
                np.save(lat_file, lat)
                child_env = dict(os.environ)
                if ("axon" in child_env.get("JAX_PLATFORMS", "")
                        and "PALLAS_AXON_POOL_IPS" not in child_env):
                    # the axon plugin can't register without its pool IPs
                    # (e.g. CPU test runs inheriting the shell's
                    # JAX_PLATFORMS=axon) — fall back to the parent backend
                    child_env["JAX_PLATFORMS"] = jax.default_backend()
                r = subprocess.run([
                    sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "decode_latents.py"),
                    "--latents", lat_file, "--vae_params", vae_path,
                    "--save_file",
                    os.path.join(sanity_dir, f"step{step}_{name}.mp4"),
                ], env=child_env)
                if r.returncode == 0:
                    os.remove(lat_file)
                else:
                    logging.warning("sanity decode subprocess failed rc=%d; "
                                    "latents kept at %s", r.returncode,
                                    lat_file)
            else:
                from hyvideo_prfl_tpu.utils.video_io import save_videos_grid
                video = np.asarray(vae.apply(vae_params, jnp.asarray(lat),
                                             method=vae.decode))
                save_videos_grid(
                    video, os.path.join(sanity_dir,
                                        f"step{step}_{name}.mp4"))

    with jax.set_mesh(mesh):
        # donate the train state: avoids a second live copy of params +
        # optimizer state per step (the 14B memory budget depends on it)
        # pin the donated state's output shardings to its input shardings:
        # otherwise GSPMD may choose different layouts and every step
        # recompiles
        out_sh = (state_shardings, None) if state_shardings else None
        refl_fn = jax.jit(refl_fn, donate_argnums=(0,), out_shardings=out_sh)
        sft_fn = jax.jit(sft_fn, donate_argnums=(0,), out_shardings=out_sh)
        timer_refl, timer_sft = StepTimer(), StepTimer()
        n_steps = max_steps or config.optimizer.max_train_steps
        for step in range(start_step, n_steps):
            batch = next(loader)
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if not isinstance(v, list)}
            rng, k1, k2 = jax.random.split(rng, 3)

            timer_refl.tic()
            state, m_refl = refl_fn(state, batch, k1, lrm_tower)
            sanity_dump(step, m_refl)
            m_refl = {k3: float(v) for k3, v in m_refl.items()
                      if k3 not in ("latent_next", "pred_x0")}
            t_refl = timer_refl.toc()

            timer_sft.tic()
            state, m_sft = sft_fn(state, batch, k2)
            m_sft = {k3: float(v) for k3, v in m_sft.items()}
            t_sft = timer_sft.toc()

            if use_ema:
                ema_params = ema_fn(ema_params, state.params)

            logger.log(step, {
                "refl_loss": m_refl["loss"], "reward": m_refl["reward"],
                "sft_loss": m_sft["loss"], "grad_norm": m_refl["grad_norm"],
                "t_refl": t_refl, "t_sft": t_sft,
            })

            if (step + 1) % 100 == 0:
                health = common.validate_params(state.params)
                if not health["finite"]:
                    logging.error("NON-FINITE PARAMS: %s", health["bad"][:5])
            if (step + 1) % config.train.save_interval == 0:
                # reference-format file writes happen on process 0 only;
                # fetch_full is a collective (allgather on pods), so every
                # process runs the fetches (FULL_STATE_DICT rank0-save,
                # model_utils.py:38-67)
                full_train = fetch_full(state.params)
                is_main = jax.process_index() == 0
                if use_lora and is_main:
                    # export merged weights + LoRA-only state dicts in all
                    # three reference formats (model_utils.py:38-67)
                    merged = lora_mod.apply_lora(params, full_train)
                    ck.save_wan_checkpoint(merged, dit_cfg, out_dir,
                                           step=step + 1)
                    import safetensors.numpy as stnp
                    for fmt in ("transformer", "kohya", "diffusers"):
                        stnp.save_file(
                            lora_mod.lora_state_dict(
                                full_train, fmt,
                                head_dim=dit_cfg.head_dim),
                            os.path.join(out_dir, f"checkpoint-{step + 1}",
                                         f"lora_{fmt}.safetensors"))
                elif is_main:
                    ck.save_wan_checkpoint(full_train, dit_cfg, out_dir,
                                           step=step + 1)
                if config.train.get("save_optimizer_state") and not use_lora:
                    # AdamW moments for exact resume (beyond the
                    # reference, which restarts the optimizer from zero).
                    # LoRA runs resume through resume_lora_path, which the
                    # opt-restore path does not cover — skip the write
                    # rather than produce an unrestorable artifact.
                    # Live (sharded) arrays: orbax writes per-host shards
                    # and barriers internally — ALL processes must call
                    ck.save_orbax(
                        os.path.join(out_dir, f"checkpoint-{step + 1}",
                                     "opt_state"), state.opt_state)
                if use_ema:
                    ema_host = fetch_full(ema_params)
                    if is_main:
                        ema_full = (lora_mod.apply_lora(params, ema_host)
                                    if use_lora else ema_host)
                        ck.save_wan_checkpoint(ema_full, dit_cfg,
                                               out_dir + "-ema",
                                               step=step + 1)
                logging.info("saved checkpoint-%d", step + 1)
    return state


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--max_steps", type=int, default=None)
    args = p.parse_args()
    main(load_config(args.config_path), max_steps=args.max_steps)
