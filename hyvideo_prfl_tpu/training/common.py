"""Shared training utilities: optimizer, train state, param partitioning.

Replaces the reference's AdamW + diffusers get_scheduler + FSDP param-group
plumbing (train_prfl.py:479-505, train_pavrm.py:440-520). Freezing is done by
partitioning the parameter pytree into (trainable, frozen) halves — the
functional equivalent of requires_grad=False — so jit sees frozen weights as
ordinary closed-over inputs and the optimizer state only covers trainables.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

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
                 max_train_steps, lr_num_cycles=1, lr_power=1.0):
    """diffusers get_scheduler surface (the reference passes num_cycles/
    power from optimizer.lr_num_cycles / lr_power — train_prfl.py:479-505):
    constant, constant_with_warmup, linear, cosine, cosine_with_restarts,
    polynomial. Warmup (linear 0 -> lr over lr_warmup_steps) applies to
    every type, as in diffusers."""
    warm = int(lr_warmup_steps or 0)
    decay_steps = max(1, max_train_steps - warm)

    if lr_scheduler in ("constant", "constant_with_warmup"):
        body = optax.constant_schedule(learning_rate)
    elif lr_scheduler == "linear":
        body = optax.linear_schedule(learning_rate, 0.0, decay_steps)
    elif lr_scheduler == "cosine":
        # diffusers get_scheduler only forwards num_cycles to
        # cosine_with_restarts; plain cosine always runs
        # get_cosine_schedule_with_warmup's default num_cycles=0.5 —
        # one half-cosine decaying to 0 at max_train_steps. lr_num_cycles
        # is deliberately ignored here (matching diffusers).
        cycles = 0.5

        def body(step):
            p = jnp.clip(step / decay_steps, 0.0, 1.0)
            return learning_rate * jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * cycles * p)))
    elif lr_scheduler == "cosine_with_restarts":
        cycles = max(1, int(lr_num_cycles))

        def body(step):
            p = jnp.clip(step / decay_steps, 0.0, 1.0)
            # diffusers returns 0 once progress >= 1.0 (steps at/after
            # max_train_steps must not train at peak LR).
            return jnp.where(
                p >= 1.0, 0.0,
                learning_rate * jnp.maximum(
                    0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * ((cycles * p) % 1.0)))))
    elif lr_scheduler == "polynomial":
        lr_end = 1e-7  # diffusers default

        def body(step):
            p = jnp.clip(step / decay_steps, 0.0, 1.0)
            return (learning_rate - lr_end) * (1.0 - p) ** lr_power + lr_end
    else:
        raise ValueError(f"unknown lr_scheduler {lr_scheduler}")

    if not warm:
        return body
    return optax.join_schedules(
        [optax.linear_schedule(0.0, learning_rate, warm), body], [warm]
    )


def make_optimizer(
    learning_rate: float = 5e-6,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_epsilon: float = 1e-8,
    weight_decay: float = 0.01,
    lr_scheduler: str = "constant",
    lr_warmup_steps: int = 0,
    lr_num_cycles: int = 1,
    lr_power: float = 1.0,
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
            _lr_schedule(lr, lr_scheduler, lr_warmup_steps, max_train_steps,
                         lr_num_cycles=lr_num_cycles, lr_power=lr_power),
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
        tx = gradient_accumulation(tx, gradient_accumulation_steps)
    return tx


class GradAccumState(NamedTuple):
    """Same field names as optax.MultiStepsState (minus skip_state) so the
    sharding/offload plumbing (parallel/sharding.opt_state_shardings) and
    orbax trees address `acc_grads` / `inner_opt_state` uniformly.

    Compat note: optimizer-state checkpoints written by the earlier
    optax.MultiSteps form carry an extra `skip_state` entry and will not
    restore onto this structure (orbax tree mismatch); strip `skip_state`
    from the saved tree, or resume params-only (the reference's own resume
    restarts moments from zero anyway)."""

    mini_step: jnp.ndarray
    gradient_step: jnp.ndarray
    inner_opt_state: Any
    acc_grads: Any


def gradient_accumulation(tx, k: int):
    """TPU-lean gradient accumulation (reference train_prfl.py:821-830:
    loss/grad_accum each micro-step, optimizer step every k).

    Same semantics as optax.MultiSteps (running-mean accumulation, emit
    every k-th update, identical per-leaf math) but restructured for the
    compiler: optax's version executes the FULL inner chain (global-norm
    clip + AdamW) on EVERY micro-step and jnp.where-selects between the
    old and new state trees — at 14B that materializes several extra
    param-sized fp32 trees per micro-step (measured: 96 GB/dev of step
    temps in the chipless AOT audit -> v5p overflow at the reference's
    flagship gradient_accumulation_steps=5). Here the inner chain runs
    under lax.cond ONLY on the emitting micro-step; skip steps are one
    fused multiply-add into acc_grads. XLA allocates cond branches as a
    union, not a sum."""

    def init(params):
        return GradAccumState(
            mini_step=jnp.zeros((), jnp.int32),
            gradient_step=jnp.zeros((), jnp.int32),
            inner_opt_state=tx.init(params),
            acc_grads=jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None, **extra):
        # running mean: acc += (g - acc) / (n + 1), optax._acc_update parity
        n1 = (state.mini_step + 1).astype(jnp.float32)
        acc = jax.tree.map(
            lambda g, a: a + (g.astype(a.dtype) - a) / n1.astype(a.dtype),
            updates, state.acc_grads)
        emit = state.mini_step == k - 1

        def do_emit(acc, inner):
            out, new_inner = tx.update(acc, inner, params, **extra)
            return out, new_inner, jax.tree.map(jnp.zeros_like, acc)

        def do_skip(acc, inner):
            return jax.tree.map(jnp.zeros_like, acc), inner, acc

        out, new_inner, new_acc = jax.lax.cond(
            emit, do_emit, do_skip, acc, state.inner_opt_state)
        new_state = GradAccumState(
            mini_step=(state.mini_step + 1) % k,
            gradient_step=state.gradient_step + emit.astype(jnp.int32),
            inner_opt_state=new_inner,
            acc_grads=new_acc,
        )
        return out, new_state

    return optax.GradientTransformation(init, update)


def init_train_state(params, tx) -> TrainState:
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def apply_grads(state: TrainState, tx, grads,
                opt_transfer=None) -> Tuple[TrainState, jnp.ndarray]:
    """One optimizer update; returns (new_state, global grad norm).

    opt_transfer: optional (device_shardings, host_shardings) trees for the
    optimizer state — the pinned-host offload path (SURVEY 5.7): moments
    live in host memory between steps and stream on-device only for the
    update, freeing ~2x param bytes of HBM at 14B.

    Known trade-off (offload x gradient accumulation): the moment stream
    runs on EVERY call, including the k-1 skip micro-steps where the
    cond-gated accumulation leaves the inner state untouched — ~2 x 15 GB
    of pinned-host traffic per micro-step at 14B, i.e. ~1-2% of a ~250 s
    refl micro-step. Gating the transfer inside the emit branch would need
    a lax.cond whose branches return host-memory-space trees (one freshly
    transferred, one passed through), which the partitioner does not
    reliably support; the flat stream is the robust form and its cost is
    carried in the audited numbers."""
    gnorm = optax.global_norm(grads)
    opt = state.opt_state
    if opt_transfer is not None:
        opt = jax.device_put(opt, opt_transfer[0])
    updates, new_opt = tx.update(grads, opt, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if opt_transfer is not None:
        new_opt = jax.device_put(new_opt, opt_transfer[1])
    return (
        TrainState(params=new_params, opt_state=new_opt, step=state.step + 1),
        gnorm,
    )


def i2v_condition(cond, flf2v: bool = False):
    """Concat the 4-channel conditioning mask onto 16-channel i2v latents.

    Parity: reference before_train_step builds mask_lat_size = ones on
    latent frame 0, zeros after, and cats it onto latents_condition when it
    has 16 channels (train_prfl.py:537-542, train_pavrm.py:585-607). For
    flf2v the last latent frame is also conditioned (the FLF2V pipeline's
    first+last mask, first_last_frame2video.py msk construction).

    cond: [B, F, H, W, 16] channel-last -> [B, F, H, W, 20].
    Pass-through for None or already-20-channel conds (reference int(c)==16
    check).
    """
    if cond is None:
        return None
    b, f, h, w, c = cond.shape
    if c != 16:
        return cond
    frames = jnp.arange(f)
    hit = frames == 0
    if flf2v:
        hit = hit | (frames == f - 1)
    mask = jnp.broadcast_to(
        hit[None, :, None, None, None].astype(cond.dtype), (b, f, h, w, 4)
    )
    return jnp.concatenate([mask, cond], axis=-1)


def reshape_clip(clip, tokens: int = 257):
    """[B, N*257, D] stacked CLIP embeds -> [B*N, 257, D] (the reference's
    rearrange "b (n s) d -> (b n) s d", train_prfl.py:545-548; N=2 for
    flf2v first+last frames, 1 otherwise)."""
    if clip is None:
        return None
    b, n_s, d = clip.shape
    n = n_s // tokens
    return clip.reshape(b * n, tokens, d)


def prepare_conditioning(batch, is_i2v: bool, flf2v: bool = False):
    """(y, clip_fea) for the DiT from a raw dataset batch."""
    if not is_i2v:
        return None, None
    return (
        i2v_condition(batch.get("cond"), flf2v),
        reshape_clip(batch.get("clip_fea")),
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


@jax.jit
def _finite_per_leaf(leaves):
    return jnp.stack([jnp.isfinite(l).all() for l in leaves])


def validate_params(params) -> dict:
    """NaN/Inf parameter health check (validate_model_parameters,
    train_pavrm.py:85-107: run at init and every 100 steps). Returns
    {"finite": bool, "bad": [leaf paths]}. All per-leaf reductions run in
    ONE compiled computation and transfer as one small bool vector — a
    per-leaf host fetch would stall the step pipeline on large trees."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    if not flat:
        return {"finite": True, "bad": []}
    ok = jax.device_get(_finite_per_leaf([leaf for _, leaf in flat]))
    bad = [jax.tree_util.keystr(path)
           for (path, _), good in zip(flat, ok) if not good]
    return {"finite": not bad, "bad": bad}
