"""PRFL: process reward feedback learning, the framework's novel core.

Parity target: reference `scripts/prfl/train_prfl.py` train_step_refl
(:585-898) + train_step (SFT, :900-1034), interleaved every outer step
(:1130-1185).

The reference structure (rollout python loop with per-step empty_cache/gc,
manual broadcast of the mid timestep, autograd through one UniPC step) maps
to TPU as ONE jitted computation:

  1. latent = N(0,1); mid ~ U[0, steps-2] drawn from the jit rng (replicated
     across the mesh => no broadcast collective needed).
  2. no-grad rollout: unipc.rollout(..., stop_index=mid) — a lax.scan of
     (DiT forward + table-driven UniPC update) under stop_gradient. No
     activations are kept (it is not differentiated), which is the compiled
     equivalent of the reference's torch.no_grad + memory hygiene.
  3. one gradient-carrying DiT forward at t_mid + unipc_step to t_mid+1.
  4. frozen trimmed-DiT (LRM) feature forward at t_mid+1, QueryAttention
     pool, sigmoid MLP, hinge loss 0.1 * relu(2 - reward).
  5. backprop crosses: LRM blocks -> scheduler step -> policy forward.

The SFT step is a plain flow-matching MSE step (train_prfl.py:900-1034).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import reward as rw
from ..models import wan_dit
from ..schedulers import flow_match as fm
from ..schedulers import unipc
from . import common
from .pavrm import PavrmConfig, PavrmModel


@dataclasses.dataclass(frozen=True)
class PrflConfig:
    inference_steps: int = 40
    flow_shift: float = 5.0
    num_train_timesteps: int = 1000
    target_reward: float = 2.0
    hinge_scale: float = 0.1
    # SFT scheduler settings (extra_model.scheduler.*)
    weighting_scheme: str = "uniform"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    is_i2v: bool = False
    is_flf2v: bool = False
    # pin the mid timestep (benchmarking/debugging); None = random per step
    fixed_mid: Optional[int] = None
    # "int8": run the NO-GRAD rollout (steps 0..mid) through the int8
    # serving path — W8A8 dense + qk-int8 flash — while the
    # gradient-carrying step, the LRM, and the SFT step stay bf16/fp32.
    # The rollout is under stop_gradient (train_prfl.py:637's no_grad), so
    # quantization noise only perturbs the mid-latent the gradient step
    # starts from, exactly like serving perturbs samples (~0.3% output
    # drift, tests/test_quant.py). 19 of ~21 forward-units per refl step
    # are rollout forwards, so the measured serving-speedup (~1.2x)
    # applies to ~90% of the step. Opt-in (train.rollout_quant); quality
    # gate: compare reward trajectories vs bf16 before production.
    rollout_quant: Optional[str] = None


class PrflModel:
    """Policy DiT + frozen LRM(trimmed DiT + heads)."""

    def __init__(self, dit_cfg: wan_dit.WanConfig, pavrm_cfg: PavrmConfig,
                 prfl_cfg: PrflConfig, policy=None):
        self.cfg = prfl_cfg
        self.dit_cfg = dit_cfg
        self.policy = policy
        self.dit = wan_dit.WanModel(dit_cfg, policy)
        self.lrm = PavrmModel(dit_cfg, pavrm_cfg, policy)


def make_refl_step(model: PrflModel, tx, lora_mode: bool = False,
                   lora_scale: float = 1.0, opt_transfer=None):
    """Build the jitted PRFL reward step.

    state.params = full policy DiT params. The frozen LRM tower
    ({"dit":..., "q":..., "m":...}) is a step ARGUMENT — closing over it
    would bake its weights into the HLO as literals. Batch supplies
    text/cond/clip conditioning and the latent SHAPE (contents unused —
    rollout starts from pure noise, train_prfl.py:637).

    lora_mode: state.params is a LoRA tree; the frozen base DiT params ride
    in lrm["base"] and merge inside the loss (training/lora.py; the
    reference's peft path, train_prfl.py:320-333)."""
    cfg = model.cfg
    sched = unipc.unipc_schedule(
        cfg.inference_steps, shift=cfg.flow_shift,
        num_train_timesteps=cfg.num_train_timesteps,
    )
    assert cfg.rollout_quant in (None, "int8"), (
        f"rollout_quant must be None or 'int8', got {cfg.rollout_quant!r} "
        "(a typo here would silently run the bf16 rollout)")
    dit_q = qshapes = None
    if cfg.rollout_quant == "int8":
        qcfg = dataclasses.replace(model.dit_cfg, quant_dense="int8",
                                   quant_attn="int8")
        dit_q = wan_dit.WanModel(qcfg, model.policy)
        qshapes = jax.eval_shape(
            lambda: wan_dit.init_params(qcfg, jax.random.PRNGKey(0)))

    def loss_fn(params, lrm, batch, rng):
        if lora_mode:
            from . import lora as lora_mod

            params = lora_mod.apply_lora(lrm["base"], params, lora_scale)
        k_noise, k_mid = jax.random.split(rng)
        shape = batch["latents"].shape
        latent0 = jax.random.normal(k_noise, shape, jnp.float32)
        # rank0-drawn + broadcast mid timestep (train_prfl.py:639-652):
        # with a replicated rng every shard draws the same value.
        if cfg.fixed_mid is not None:
            mid = jnp.asarray(cfg.fixed_mid, jnp.int32)
        else:
            mid = jax.random.randint(k_mid, (), 0, cfg.inference_steps - 1)

        # i2v/flf2v: 4-channel mask + condition latents, CLIP reshape
        # (train_prfl.py:537-548)
        y, clip_fea = common.prepare_conditioning(
            batch, cfg.is_i2v, cfg.is_flf2v
        )

        # token-major rollout: the scan carries the solver state in the
        # token-cell layout (wan_dit.patchify) so no video<->token layout
        # boundary — the reshard SPMD can only do by full rematerialization
        # — exists inside the compiled loop. Conversions happen ONCE here.
        patch = model.dit_cfg.patch_size
        latent0_t, grid = wan_dit.patchify_sharded(latent0, patch,
                                                   model.policy)
        y_t = None
        if y is not None:
            y_t = wan_dit.patchify_sharded(y, patch, model.policy)[0]

        def velocity(x, t):
            out = model.dit.apply(
                params, x, t, batch["text"], y=y_t, clip_fea=clip_fea,
                grid=grid,
            )
            return out

        # ---- 1-2. no-grad rollout to mid ----
        if dit_q is not None:
            # quantize the LIVE policy weights once per step (pure jnp,
            # ~one stream pass over the params — negligible vs 19 model
            # forwards) and run the rollout through the int8 graph
            from ..ops import quant as quant_mod

            qparams = jax.lax.stop_gradient(
                quant_mod.quantize_params(params, qshapes))

            def rollout_vel(x, t):
                return dit_q.apply(qparams, x, t, batch["text"], y=y_t,
                                   clip_fea=clip_fea, grid=grid)
        else:
            rollout_vel = velocity
        frozen_vel = lambda x, t: jax.lax.stop_gradient(
            rollout_vel(jax.lax.stop_gradient(x), t)
        )
        # NOTE: a statically-truncated scan (num_steps=fixed_mid) is
        # numerically identical and compiles on CPU, but crashes the axon
        # remote TPU compiler (HTTP 500, no diagnostic) — keep the traced
        # stop_index form, whose lax.cond skips the model call at runtime.
        latent, solver_state = unipc.rollout(
            sched, frozen_vel, latent0_t, stop_index=mid
        )
        latent = jax.lax.stop_gradient(latent)
        solver_state = jax.lax.stop_gradient(solver_state)

        # ---- 3. ONE gradient-carrying step at t_mid ----
        t_mid = sched.timesteps[mid]
        v = velocity(latent, t_mid)
        # continue the solver from the truncated state (step_index == mid)
        latent_next, _ = unipc.unipc_step(sched, solver_state, v, latent)

        # ---- 4. frozen LRM reward at t_mid+1 ----
        t_mid1 = sched.timesteps[jnp.minimum(mid + 1, cfg.inference_steps - 1)]
        logits = model.lrm.score(
            lrm["dit"], lrm["q"], lrm["m"],
            latent_next, t_mid1, batch["text"], y=y_t, clip_fea=clip_fea,
            grid=grid,
        )
        reward = rw.reward_sigmoid(logits)[:, 0]
        loss = rw.prfl_hinge_loss(
            reward, cfg.target_reward, cfg.hinge_scale
        )
        # one-shot x0 estimate for sanity dumps (train_prfl.py:854-856) —
        # back to video layout for the host-side mp4 dump, via the mesh-safe
        # gather-then-reshape exit conversion (outside the scan)
        sigma_mid1 = sched.sigmas[jnp.minimum(mid + 1, cfg.inference_steps)]
        pred_x0_t = latent_next - sigma_mid1 * v

        def to_video(tok):
            return wan_dit.unpatchify_sharded(tok, grid, patch, model.policy)

        return loss, {"reward": reward.mean(), "mid": mid,
                      "latent_next": to_video(latent_next),
                      "pred_x0": to_video(pred_x0_t)}

    def refl_step(state: common.TrainState, batch, rng, lrm):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lrm, batch, rng
        )
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        new_state, gnorm = common.apply_grads(state, tx, grads,
                                              opt_transfer=opt_transfer)
        return new_state, {
            "loss": jnp.where(finite, loss, 0.0),
            "grad_norm": gnorm,
            "reward": aux["reward"],
            "mid": aux["mid"],
            # device arrays; only transferred if the host fetches them
            # (sanity-check mp4 dumps, train_prfl.py:849-887)
            "latent_next": aux["latent_next"],
            "pred_x0": aux["pred_x0"],
        }

    return refl_step


def make_sft_step(model: PrflModel, tx, schedule: fm.FlowMatchSchedule,
                  sft_cfg: Optional[PrflConfig] = None,
                  lora_mode: bool = False, lora_scale: float = 1.0,
                  lora_base=None, opt_transfer=None):
    """Flow-matching SFT step (train_prfl.py:900-1034): sample (t, sigma),
    add noise to cached data latents, MSE(v_pred, eps - x0)."""
    cfg = sft_cfg or model.cfg

    def loss_fn(params, batch, rng):
        if lora_mode:
            from . import lora as lora_mod

            params = lora_mod.apply_lora(lora_base, params, lora_scale)
        b = batch["latents"].shape[0]
        k_t, k_n = jax.random.split(rng)
        t, sigma = fm.sample_train_timestep(
            k_t, schedule, b, cfg.weighting_scheme, cfg.logit_mean,
            cfg.logit_std,
        )
        sig5 = sigma.reshape(-1, 1, 1, 1, 1)
        noise = jax.random.normal(k_n, batch["latents"].shape, jnp.float32)
        noisy = fm.add_noise(batch["latents"], noise, sig5)
        target = fm.train_target(batch["latents"], noise)
        y, clip_fea = common.prepare_conditioning(
            batch, cfg.is_i2v, cfg.is_flf2v
        )
        v = model.dit.apply(params, noisy, t, batch["text"], y=y,
                            clip_fea=clip_fea)
        w = fm.loss_weighting(sig5)
        loss = jnp.mean(w * jnp.square(v - target))
        return loss, {}

    def sft_step(state: common.TrainState, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        new_state, gnorm = common.apply_grads(state, tx, grads,
                                              opt_transfer=opt_transfer)
        return new_state, {"loss": jnp.where(finite, loss, 0.0),
                           "grad_norm": gnorm}

    return sft_step
