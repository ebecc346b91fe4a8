"""Shared training utilities: optimizer, train state, param partitioning.

Replaces the reference's AdamW + diffusers get_scheduler + FSDP param-group
plumbing (train_prfl.py:479-505, train_pavrm.py:440-520). Freezing is done by
partitioning the parameter pytree into (trainable, frozen) halves — the
functional equivalent of requires_grad=False — so jit sees frozen weights as
ordinary closed-over inputs and the optimizer state only covers trainables.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax


@chex.dataclass
class TrainState:
    params: Any  # trainable params pytree
    opt_state: Any
    step: jnp.ndarray  # int32


def _lr_schedule(learning_rate, lr_scheduler, lr_warmup_steps,
                 max_train_steps):
    if lr_scheduler == "constant":
        sched = optax.constant_schedule(learning_rate)
        if lr_warmup_steps:
            sched = optax.join_schedules(
                [optax.linear_schedule(0.0, learning_rate, lr_warmup_steps), sched],
                [lr_warmup_steps],
            )
        return sched
    if lr_scheduler == "linear":
        return optax.linear_schedule(learning_rate, 0.0, max_train_steps)
    if lr_scheduler == "cosine":
        return optax.cosine_decay_schedule(learning_rate, max_train_steps)
    raise ValueError(f"unknown lr_scheduler {lr_scheduler}")


def make_optimizer(
    learning_rate: float = 5e-6,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_epsilon: float = 1e-8,
    weight_decay: float = 0.01,
    lr_scheduler: str = "constant",
    lr_warmup_steps: int = 0,
    max_train_steps: int = 1_000_000,
    max_grad_norm: float = 1.0,
    gradient_accumulation_steps: int = 1,
    learning_rate_mlp: Optional[float] = None,
    head_keys: Tuple[str, ...] = ("q_attn", "mlp"),
) -> optax.GradientTransformation:
    """AdamW + global-norm clip + LR schedule (+ optional grad accumulation),
    matching optimizer_init (train_prfl.py:479-505) and clip_grad_norm_
    (train_prfl.py:825). `learning_rate_mlp` gives the reward heads their
    own LR (the reference's separate param group, config
    optimizer.learning_rate_mlp)."""

    def adamw(lr):
        return optax.adamw(
            _lr_schedule(lr, lr_scheduler, lr_warmup_steps, max_train_steps),
            b1=adam_beta1, b2=adam_beta2, eps=adam_epsilon,
            weight_decay=weight_decay,
        )

    if learning_rate_mlp is not None:
        def label_fn(params):
            return {k: ("head" if k in head_keys else "body")
                    for k in params}

        inner = optax.multi_transform(
            {"body": adamw(learning_rate), "head": adamw(learning_rate_mlp)},
            label_fn,
        )
    else:
        inner = adamw(learning_rate)

    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), inner)
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx


def init_train_state(params, tx) -> TrainState:
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def apply_grads(state: TrainState, tx, grads) -> Tuple[TrainState, jnp.ndarray]:
    """One optimizer update; returns (new_state, global grad norm)."""
    gnorm = optax.global_norm(grads)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        TrainState(params=new_params, opt_state=new_opt, step=state.step + 1),
        gnorm,
    )


def split_tree(tree: Dict, pred: Callable[[str], bool]) -> Tuple[Dict, Dict]:
    """Split a (flax) param dict at the top level by key predicate."""
    inner = tree["params"] if "params" in tree else tree
    a = {k: v for k, v in inner.items() if pred(k)}
    b = {k: v for k, v in inner.items() if not pred(k)}
    if "params" in tree:
        return {"params": a}, {"params": b}
    return a, b


def merge_tree(a: Dict, b: Dict) -> Dict:
    ia = a["params"] if "params" in a else a
    ib = b["params"] if "params" in b else b
    merged = {**ia, **ib}
    if "params" in a or "params" in b:
        return {"params": merged}
    return merged


def slice_blocks(params: Dict, k: int) -> Dict:
    """Trim a WanModel param tree to its first k blocks and drop the head —
    the PAVRM/LRM trimmed model (train_pavrm.py:200-237, train_prfl.py:242-258).
    Stacked block params [L, ...] are sliced to [:k]."""
    inner = dict(params["params"])
    inner["blocks"] = jax.tree.map(lambda a: a[:k], inner["blocks"])
    inner.pop("head", None)
    return {"params": inner}


def global_norm_finite(grads) -> jnp.ndarray:
    """Finite-guarded gradient norm (NaN/Inf guard, train_pavrm.py:874-880)."""
    return optax.global_norm(grads)


def validate_params(params) -> dict:
    """NaN/Inf parameter health check (validate_model_parameters,
    train_pavrm.py:85-107: run at init and every 100 steps). Returns
    {"finite": bool, "bad": [leaf paths]} — one device sync."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    bad = []
    for path, leaf in flat:
        if not bool(jnp.isfinite(leaf).all()):
            bad.append(jax.tree_util.keystr(path))
    return {"finite": not bad, "bad": bad}
