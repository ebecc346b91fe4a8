"""PAVRM training: latent reward model on noisy DiT features.

Parity target: reference `scripts/pavrm/train_pavrm.py` train_step
(:671-920) and evaluate_model (:1003-1280). The model is the FIRST-K-BLOCKS
trimmed WanModel (head removed; embeddings frozen; blocks trainable) plus a
QueryAttention pooler and a RewardMLP scalar head.

Objectives:
* "ce": pointwise sigmoid(MLP(pool(features))) vs binary quality label, BCE.
* "bt": pairwise Bradley-Terry on (win, lose) clips, sigmoid(r_w - r_l) vs 1.

TPU-native shape: everything is one jitted step over the (data, sp) mesh;
the reference's SP broadcast + all_gather of features (train_pavrm.py:742-757,
model.py:663-667) is expressed by sharding constraints instead.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import reward as rw
from ..models import wan_dit
from ..schedulers import flow_match as fm
from . import common


@dataclasses.dataclass(frozen=True)
class PavrmConfig:
    """lrm.* + scheduler config surface (configs/train_pavrm_*.yaml)."""

    loss: str = "ce"  # ce | bt
    pool: str = "q_attn"  # q_attn | mean | max
    feature_layer: Tuple[int, ...] = (8,)
    trainable_blocks: Tuple[int, ...] = tuple(range(8))
    num_queries: int = 1
    num_heads: int = 8
    return_type: Optional[str] = "query"
    # timestep selection: fixed cycling list, or None => sampled
    timesteps: Optional[Tuple[int, ...]] = None
    weighting_scheme: str = "logit_normal"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    num_train_timesteps: int = 1000
    task: str = "t2v"  # governs conditioning inputs

    @property
    def is_i2v(self) -> bool:
        return "i2v" in self.task or "flf2v" in self.task

    @property
    def is_flf2v(self) -> bool:
        return "flf2v" in self.task


def trimmed_config(cfg: wan_dit.WanConfig, num_blocks: int) -> wan_dit.WanConfig:
    return dataclasses.replace(cfg, num_layers=num_blocks)


class PavrmModel:
    """Bundles the trimmed DiT + heads and their apply functions."""

    def __init__(self, dit_cfg: wan_dit.WanConfig, pc: PavrmConfig,
                 policy=None):
        self.pc = pc
        n_blocks = max(pc.feature_layer)
        assert n_blocks <= dit_cfg.num_layers
        # every shipped config trains exactly the kept blocks
        # (trainable_blocks == range(max(feature_layer)),
        # configs/train_pavrm_*.yaml); a strict subset would need an optax
        # mask — assert so a silent mismatch can't train the wrong params
        if pc.trainable_blocks:
            kept = tuple(b for b in pc.trainable_blocks if b < n_blocks)
            assert kept == tuple(range(n_blocks)), (
                f"trainable_blocks must cover range({n_blocks}) (the kept "
                "blocks); strict-subset masking is not implemented")
        self.dit_cfg = trimmed_config(dit_cfg, n_blocks)
        self.dit = wan_dit.WanModel(self.dit_cfg, policy)
        self.q_attn = rw.QueryAttention(
            feature_dim=dit_cfg.dim,
            num_queries=pc.num_queries,
            num_heads=pc.num_heads,
            return_type=pc.return_type,
        )
        self.mlp = rw.RewardMLP()

    def init_head_params(self, rng):
        k1, k2 = jax.random.split(rng)
        d = self.dit_cfg.dim
        qp = self.q_attn.init(k1, jnp.zeros((1, 8, d)))
        mp = self.mlp.init(k2, jnp.zeros((1, d)))
        return qp, mp

    def init_all(self, rng, sample_shape=(1, 4, 8, 8, None)):
        """Returns (trainable, frozen_dit): trainable = {blocks, q_attn, mlp}."""
        k1, k2 = jax.random.split(rng)
        dit_params = wan_dit.init_params(self.dit_cfg, k1, sample_shape)
        qp, mp = self.init_head_params(k2)
        blocks = {"params": {"blocks": dit_params["params"]["blocks"]}}
        frozen = {"params": {k: v for k, v in dit_params["params"].items()
                             if k != "blocks"}}
        trainable = {
            "blocks": blocks["params"]["blocks"],
            "q_attn": qp["params"],
            "mlp": mp["params"],
        }
        return trainable, frozen

    def score(self, dit_params, q_params, m_params, noisy_latents, t,
              text, y=None, clip_fea=None, grid=None) -> jnp.ndarray:
        """noisy latents -> reward logits [B, 1] (pre-sigmoid).

        noisy_latents may be video [B,F,H,W,C] or token-cell [B,L,cells,C]
        with `grid` (the PRFL refl path keeps the whole rollout+reward chain
        token-major; feature taps are token-major either way)."""
        feats = self.dit.apply(
            dit_params, noisy_latents, t, text, y=y, clip_fea=clip_fea,
            grid=grid,
            output_features=True, selected_layers=self.pc.feature_layer,
        )
        pooled = rw.pool_features(
            feats, self.pc.pool,
            q_attn_apply=lambda f: self.q_attn.apply(q_params, f),
        )
        return self.mlp.apply(m_params, pooled)


def select_timestep(rng, pc: PavrmConfig, schedule: fm.FlowMatchSchedule,
                    step: jnp.ndarray, batch_size: int):
    """Fixed cycling timestep list (train_pavrm.py:721-730) or sampled
    (:732-739). Returns (t [B], sigma [B])."""
    if pc.timesteps is not None:
        ts = jnp.asarray(pc.timesteps, jnp.float32)
        t = jnp.broadcast_to(ts[step % len(pc.timesteps)], (batch_size,))
        sigma = fm.sigma_for_timestep(schedule, t)
        return t, sigma
    return fm.sample_train_timestep(
        rng, schedule, batch_size, pc.weighting_scheme, pc.logit_mean,
        pc.logit_std,
    )


def make_train_step(model: PavrmModel, tx, schedule: fm.FlowMatchSchedule,
                    opt_transfer=None):
    """Build the jitted PAVRM train step.

    State params layout: {"blocks": <trainable dit blocks>,
    "q_attn": ..., "mlp": ...}; `frozen_dit` (embedding/etc. DiT params) is
    a step ARGUMENT — closing over it would bake hundreds of MB of weights
    into the HLO as literals (breaks remote compile; bloats every compile).
    """
    pc = model.pc

    def loss_fn(trainable, frozen_dit, batch, rng, step):
        def assemble_dit(trainable):
            return common.merge_tree(
                {"params": {"blocks": trainable["blocks"]}}, frozen_dit
            )

        b = batch["latents"].shape[0]
        k_t, k_n = jax.random.split(rng)
        t, sigma = select_timestep(k_t, pc, schedule, step, b)
        sig5 = sigma.reshape(-1, 1, 1, 1, 1)
        dit_params = assemble_dit(trainable)
        qp = {"params": trainable["q_attn"]}
        mp = {"params": trainable["mlp"]}
        # i2v/flf2v mask + CLIP reshape (train_pavrm.py:585-607)
        clip_fea = (common.reshape_clip(batch.get("clip_fea"))
                    if pc.is_i2v else None)

        def score(latents, y):
            noise = jax.random.normal(k_n, latents.shape, jnp.float32)
            noisy = fm.add_noise(latents, noise, sig5)
            return model.score(
                dit_params, qp, mp, noisy, t, batch["text"],
                y=y, clip_fea=clip_fea,
            )

        def cond_of(key):
            return (common.i2v_condition(batch.get(key), pc.is_flf2v)
                    if pc.is_i2v else None)

        if pc.loss == "ce":
            logits = score(batch["latents"], cond_of("cond"))
            probs = rw.reward_sigmoid(logits)[:, 0]
            loss = rw.bce_loss(probs, batch["labels"].astype(jnp.float32))
            acc = jnp.mean(((probs > 0.5) == (batch["labels"] > 0.5)))
        else:  # bt
            r_win = score(batch["latents"], cond_of("cond"))
            r_lose = score(batch["latents_lose"], cond_of("cond_lose"))
            probs = rw.siamese_prob(r_win, r_lose)[:, 0]
            loss = rw.bce_loss(probs, jnp.ones_like(probs))
            acc = jnp.mean((probs > 0.5).astype(jnp.float32))
        return loss, {"probs": probs, "acc": acc}

    def train_step(state: common.TrainState, batch, rng, frozen_dit):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen_dit, batch, rng, state.step
        )
        # NaN/Inf guard: zero out bad grads, keep loss logged
        # (train_pavrm.py:874-897's zero-loss fallback, compiled form)
        finite = jnp.isfinite(loss) & jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        new_state, gnorm = common.apply_grads(state, tx, grads,
                                              opt_transfer=opt_transfer)
        metrics = {
            "loss": jnp.where(finite, loss, 0.0),
            "grad_norm": gnorm,
            "acc": aux["acc"],
        }
        return new_state, metrics

    return train_step


def make_eval_step(model: PavrmModel):
    """Fixed-seed eval forward: returns probs for metric computation
    (evaluate_model, train_pavrm.py:1003-1280)."""
    pc = model.pc

    def eval_step(trainable, frozen_dit, batch, t_value, seed):
        b = batch["latents"].shape[0]
        dit_params = common.merge_tree(
            {"params": {"blocks": trainable["blocks"]}}, frozen_dit
        )
        qp = {"params": trainable["q_attn"]}
        mp = {"params": trainable["mlp"]}
        t = jnp.full((b,), t_value, jnp.float32)
        sigma = t_value / pc.num_train_timesteps
        noise = jax.random.normal(jax.random.PRNGKey(seed), batch["latents"].shape)
        noisy = fm.add_noise(batch["latents"], noise, sigma)
        y, clip_fea = common.prepare_conditioning(
            batch, pc.is_i2v, pc.is_flf2v
        )
        logits = model.score(
            dit_params, qp, mp, noisy, t, batch["text"],
            y=y, clip_fea=clip_fea,
        )
        return rw.reward_sigmoid(logits)[:, 0]

    return eval_step


def classification_metrics(probs: np.ndarray, labels: np.ndarray,
                           threshold: float = 0.5):
    """accuracy / precision / recall / f1 (sklearn-equivalent,
    train_pavrm.py:1244-1253)."""
    pred = (probs > threshold).astype(np.int32)
    y = labels.astype(np.int32)
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    acc = float((pred == y).mean()) if len(y) else 0.0
    prec = tp / (tp + fp) if (tp + fp) else 0.0
    rec = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    return {"accuracy": acc, "precision": prec, "recall": rec, "f1": f1}
