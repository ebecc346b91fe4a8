"""PAVRM reward-model training CLI.

Usage parity with the reference (scripts/pavrm/train_pavrm.py:1368):

    python scripts/train_pavrm.py --config_path configs/train_pavrm_t2v_480.yaml

Loads the same YAML schema, reads the same latent-cache dataset format, and
runs the jitted PAVRM train step (ce or bt) over the (data, sp) mesh.
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
    MetricLogger, StepTimer, batched_eval, build_mesh, dit_cfg_from,
    fetch_full, fsdp_strategy_from, make_sharded_state, make_train_loader,
)
from hyvideo_prfl_tpu.configs import load_config
from hyvideo_prfl_tpu.data.dataset import LatentCacheDataset
from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.parallel import sharding as shd
from hyvideo_prfl_tpu.schedulers import flow_match as fm
from hyvideo_prfl_tpu.training import common
from hyvideo_prfl_tpu.training.pavrm import (
    PavrmConfig, PavrmModel, classification_metrics, make_eval_step,
    make_train_step,
)
from hyvideo_prfl_tpu.utils import checkpoint as ck


def export_lrm_artifacts(trainable_host, frozen_host, model, out_dir, step):
    """Reference-format PAVRM artifacts for the PRFL handoff.

    Mirrors reference train_pavrm.py:978-998 (save_checkpoint + save_model):
    * transformer/checkpoint-<n>/ — the assembled trimmed HEAD-LESS LRM
      transformer in wan safetensors layout (the reference deletes head +
      non-kept blocks before saving, train_pavrm.py:219-236); consumed by
      train_prfl's model.lrm_transformer_path.
    * mlp/mlp_step_<n>.ckpt, mlp/query_attention_step_<n>.ckpt — torch
      state dicts (network.py:216-217 save_model), consumed by
      model.lrm_mlp_path / model.lrm_query_attention_path.
    """
    import torch

    from hyvideo_prfl_tpu.utils import convert_encoders as ce

    lrm_dit = common.merge_tree(
        {"params": {"blocks": trainable_host["blocks"]}}, frozen_host)
    lrm_dit["params"].pop("head", None)
    ck.save_wan_checkpoint(lrm_dit, model.dit_cfg,
                           os.path.join(out_dir, "transformer"), step=step)
    mlp_dir = os.path.join(out_dir, "mlp")
    os.makedirs(mlp_dir, exist_ok=True)

    def save_torch(state, fname):
        # np.array(..., copy=True): jnp-backed arrays are non-writable and
        # torch.from_numpy warns on them
        torch.save(
            {k: torch.from_numpy(np.array(v, copy=True))
             for k, v in state.items()},
            os.path.join(mlp_dir, fname))

    save_torch(ce.reward_mlp_flax_to_torch({"params": trainable_host["mlp"]}),
               f"mlp_step_{step}.ckpt")
    if "q_attn" in model.pc.pool:
        save_torch(
            ce.query_attention_flax_to_torch(
                {"params": trainable_host["q_attn"]}),
            f"query_attention_step_{step}.ckpt")


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
        loss=config.lrm.loss,
        pool=config.lrm.pool,
        feature_layer=tuple(config.lrm.feature_layer),
        trainable_blocks=tuple(config.lrm.trainable_blocks),
        num_queries=config.lrm.query_attention.num_queries,
        num_heads=config.lrm.query_attention.num_heads,
        return_type=config.lrm.query_attention.return_type,
        timesteps=tuple(config.lrm.timestep) if config.lrm.timestep else None,
        weighting_scheme=config.extra_model.scheduler.weighting_scheme,
        logit_mean=config.extra_model.scheduler.logit_mean,
        logit_std=config.extra_model.scheduler.logit_std,
        task=config.task,
    )
    policy = shd.ShardingPolicy() if mesh.devices.size > 1 else None
    model = PavrmModel(dit_cfg, pc, policy)

    rng = jax.random.PRNGKey(config.train.seed)
    base = config.model.base_path
    if base and os.path.isdir(base):
        logging.info("loading base DiT from %s", base)
        full = ck.load_wan_checkpoint(base, dit_cfg)
        trimmed = common.slice_blocks(full, model.dit_cfg.num_layers)
        trainable = {"blocks": trimmed["params"]["blocks"]}
        frozen = {"params": {k: v for k, v in trimmed["params"].items()
                             if k != "blocks"}}
        qp, mp = model.init_head_params(rng)
        trainable["q_attn"] = qp["params"]
        trainable["mlp"] = mp["params"]
    else:
        logging.info("no base checkpoint; random init (smoke mode)")
        trainable, frozen = model.init_all(rng)

    # resume: the reference restarts the PAVRM trainable state from
    # checkpoint-<n> and continues at the parsed step
    # (/root/reference/scripts/pavrm/train_pavrm.py:254-259)
    resume = config.model.get("resume_transformer_path")
    start_step = 0
    if resume and os.path.isdir(resume):
        resume = os.path.normpath(resume)  # "-opt" suffixing below
        logging.info("resuming PAVRM trainable state from %s", resume)
        trainable = ck.load_orbax(resume)
        start_step = ck.parse_resume_step(resume)

    tx = common.make_optimizer(
        learning_rate=config.optimizer.learning_rate,
        learning_rate_mlp=config.optimizer.learning_rate_mlp,
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
    state, opt_transfer, state_shardings = make_sharded_state(
        mesh, trainable, tx,
        offload_opt=bool(config.train.get("offload_opt_state")
                         or config.get_path("model.fsdp.use_cpu_offload")),
        strategy=fsdp_strategy_from(config))
    if resume and os.path.isdir(resume + "-opt"):
        # exact resume (beyond the reference, which restarts AdamW moments
        # from zero): restore the optimizer state written by
        # train.save_optimizer_state onto the live shardings
        restored = ck.load_orbax(resume + "-opt", like=state.opt_state)
        if state_shardings is not None:
            restored = jax.device_put(restored, state_shardings.opt_state)
        state = state.replace(opt_state=restored,
                              step=jnp.asarray(start_step, jnp.int32))
        logging.info("restored optimizer state from %s-opt", resume)

    ds_type = "lrm_ce" if pc.loss == "ce" else "lrm_bt_online"
    dataset = LatentCacheDataset(
        ds_type,
        meta_file_list=list(config.dataset.meta_file_list),
        meta_file_lose_list=list(config.dataset.get("meta_file_lose_list", [])),
        uncond_prob=list(config.dataset.uncond_prob),
        text_len=config.extra_model.get_path("text_encoder.t5_text_len", 512),
        label_key=config.lrm.task,
        null_dir=config.dataset.null_dir,
        is_i2v=is_i2v,
        is_flf2v="flf2v" in config.task,
        seed=config.train.seed,
    )
    # raw resume step; make_train_loader wraps it into the per-replica
    # block exactly once (a second modulo here would shift the offset)
    loader = make_train_loader(config, dataset, mesh, start_index=start_step)

    step_fn = make_train_step(model, tx, fm.train_schedule(
        config.extra_model.scheduler.num_train_timesteps),
        opt_transfer=opt_transfer)
    eval_fn = make_eval_step(model)
    val_lists = list(config.dataset.get("val_meta_file_list") or [])
    val_dataset = LatentCacheDataset(
        "lrm_ce", meta_file_list=val_lists, label_key=config.lrm.task,
        text_len=config.extra_model.get_path("text_encoder.t5_text_len", 512),
        null_dir=config.dataset.null_dir, is_i2v=is_i2v,
        seed=config.eval.seed,
    ) if val_lists else None

    def run_eval(state, jitted_eval):
        """Per-timestep val metrics at save_interval (train_pavrm.py:1342-1354),
        [B]-batched over shape buckets (one data pass, few dispatches). On
        pods every process runs the identical eval (deterministic dataset
        order) with batches placed replicated on the global mesh."""
        put = None
        if jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            put = lambda a: jax.device_put(a, rep)  # noqa: E731
        results = batched_eval(
            jitted_eval, state.params, frozen, val_dataset,
            list(config.eval.timestep), config.eval.seed,
            batch_size=int(config.eval.get("batch_size") or 8), put=put)
        for t_val in config.eval.timestep:
            probs, labels = results[float(t_val)]
            m = classification_metrics(np.asarray(probs), np.asarray(labels))
            logger.log(int(state.step), m, prefix=f"val_t{t_val}")

    with jax.set_mesh(mesh):
        step_fn = jax.jit(
            step_fn, donate_argnums=(0,),
            out_shardings=(state_shardings, None) if state_shardings
            else None)
        # pin replicated outputs under a mesh so np.asarray of the probs is
        # addressable on every process (pods) and cheap on one
        ev_out = (jax.NamedSharding(mesh, jax.P())
                  if mesh.devices.size > 1 else None)
        jitted_eval = jax.jit(eval_fn, static_argnums=(4,),
                              out_shardings=ev_out)
        timer = StepTimer()
        n_steps = max_steps or config.optimizer.max_train_steps
        for step in range(start_step, n_steps):
            batch = next(loader)
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if not isinstance(v, list)}
            rng, k = jax.random.split(rng)
            timer.tic()
            state, metrics = step_fn(state, batch, k, frozen)
            metrics = {k2: float(v) for k2, v in metrics.items()}
            dt = timer.toc()
            logger.log(step, {**metrics, "step_time": dt})
            if (step + 1) % 100 == 0:
                health = common.validate_params(state.params)
                if not health["finite"]:
                    logging.error("NON-FINITE PARAMS: %s", health["bad"][:5])
            if (step + 1) % config.train.save_interval == 0:
                path = os.path.join(out_dir, f"checkpoint-{step + 1}")
                if jax.process_count() > 1:
                    # pods: pass the LIVE sharded arrays — orbax writes
                    # per-host shards and barriers internally, so ALL
                    # processes must make the same save call (device_get
                    # of a cross-process array would throw)
                    ck.save_orbax(path, state.params)
                else:
                    ck.save_orbax(path, jax.device_get(state.params))
                if config.train.get("save_optimizer_state"):
                    # AdamW moments for exact resume (sharded arrays are
                    # written per-host by orbax; with offload_opt_state
                    # they stream from pinned host memory)
                    ck.save_orbax(path + "-opt", state.opt_state)
                if config.train.get("save_reference_artifacts", True):
                    # reference-format artifacts for the PRFL handoff
                    # (reference train_pavrm.py:978-998): the trimmed
                    # head-less LRM transformer (wan safetensors layout) +
                    # torch head ckpts, consumed by scripts/train_prfl.py's
                    # model.lrm_*_path loader. Collective fetch on pods,
                    # rank-0 writes.
                    host = fetch_full(state.params)
                    host_frozen = fetch_full(frozen)
                    if jax.process_index() == 0:
                        export_lrm_artifacts(host, host_frozen, model,
                                             out_dir, step + 1)
                logging.info("saved %s", path)
                if val_dataset is not None:
                    run_eval(state, jitted_eval)
    return state


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--max_steps", type=int, default=None)
    args = p.parse_args()
    main(load_config(args.config_path), max_steps=args.max_steps)
