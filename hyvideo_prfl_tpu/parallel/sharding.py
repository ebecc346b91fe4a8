"""Mesh + sharding policy: the single layer replacing the reference's
parallel_states / communication / fsdp_utils / xfuser stack (SURVEY.md 2.8).

Design: one logical mesh with axes ("data", "sp").
* Parameters are fully sharded over all devices (FSDP/ZeRO-3 equivalent of
  fsdp_utils.py:66-122) via NamedSharding on the flattened (data*sp) axes.
* Activations are batch-sharded on "data" and sequence-sharded on "sp"
  (DeepSpeed-Ulysses, parallel_states.py:35-75 + all_to_all_4D).
* Inside attention, heads are sharded on "sp" and sequence gathered — XLA
  inserts the all_to_all pair automatically from the sharding constraints
  (the compiled equivalent of communication.py:40-160). All collectives ride
  ICI; nothing like the reference's autograd-aware wrappers is needed since
  JAX collectives differentiate natively.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SP_AXIS = "sp"
RING_AXIS = "ring"

#: libtpu flags that make XLA-TPU lower all_to_all as async start/done
#: pairs (and let async collective fusion span Mosaic custom-calls), so
#: the head-chunked Ulysses sandwich (HYV_ULYSSES_CHUNKS,
#: ops/attention.ulysses_chunks) can overlap a2a with the flash kernels.
#: Verified from AOT-compiled HLO: without these the shard_map a2a is
#: synchronous (COMM_AUDIT round 4); with them + chunking, a2a start/done
#: windows span flash custom-calls in the final schedule
#: (tests/test_ulysses_chunked.py).
ASYNC_COLLECTIVE_FLAGS = (
    "--xla_tpu_enable_async_all_to_all=true "
    "--xla_tpu_enable_async_collective_fusion_with_mosaic_custom_call=true"
)


def enable_async_collectives() -> None:
    """Append ASYNC_COLLECTIVE_FLAGS to LIBTPU_INIT_ARGS. Must run before
    libtpu is initialized (i.e. before the first jax.devices() on a real
    TPU); a no-op if the flags are already present."""
    import os

    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "--xla_tpu_enable_async_all_to_all" not in cur:
        os.environ["LIBTPU_INIT_ARGS"] = (
            cur + " " + ASYNC_COLLECTIVE_FLAGS).strip()


def make_mesh(
    data: int = 1,
    sp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the ("data", "sp") mesh. data*sp must equal device count."""
    devices = list(devices if devices is not None else jax.devices())
    assert data * sp == len(devices), (
        f"mesh {data}x{sp} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(data, sp)
    return Mesh(arr, (DATA_AXIS, SP_AXIS))


def make_usp_mesh(
    data: int = 1,
    ring: int = 1,
    ulysses: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """("data", "ring", "sp") mesh for USP inference — the xfuser
    `initialize_model_parallel(ring_degree, ulysses_degree)` topology
    (inference_prfl.py:71-82). ring varies slower so K/V rotation stays on
    adjacent ICI neighbors."""
    devices = list(devices if devices is not None else jax.devices())
    assert data * ring * ulysses == len(devices), (
        f"mesh {data}x{ring}x{ulysses} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(data, ring, ulysses)
    return Mesh(arr, (DATA_AXIS, RING_AXIS, SP_AXIS))


@dataclasses.dataclass(frozen=True)
class ShardingPolicy:
    """Activation partition specs threaded through the model.

    With policy=None the model places no constraints (single-device path).
    """

    # [B, L, D] token stream: batch on data, sequence on sp
    tokens: P = P(DATA_AXIS, SP_AXIS, None)
    # [B, L, N, Dh] attention operands during the attention op itself:
    # heads on sp, sequence gathered (Ulysses head-swap)
    attn_heads: P = P(DATA_AXIS, None, SP_AXIS, None)
    # [B, N, L, Dh] head-major q/k (the fused qknorm_rope output layout)
    attn_heads_bnld: P = P(DATA_AXIS, SP_AXIS, None, None)
    # [B, L, N, Dh] qkv with tokens sharded on sp (shard_map Ulysses input)
    attn_heads_sp_tokens: P = P(DATA_AXIS, SP_AXIS, None, None)
    # [B, Lctx, D] text context: replicated over sp (short seq)
    context: P = P(DATA_AXIS, None, None)
    # [B, dim] / [B, 6, dim] fp32 time embeddings: replicated over sp.
    # Without this the FSDP-sharded time_2/time_proj kernels leave e sharded
    # on its feature dim, and the head's broadcast forces an involuntary
    # full rematerialization each step (SPMD warning in the 8-dev dryrun).
    time_embed: P = P(DATA_AXIS, None)
    time_mod: P = P(DATA_AXIS, None, None)
    # [B, F, H, W, C] video tensors: W on sp (latent frame counts are 4n+1
    # and rarely divisible by sp; W is stride-8-aligned and always divides)
    video: P = P(DATA_AXIS, None, None, SP_AXIS, None)
    # [B, L, cells, C] token-cell latents (models.wan_dit.patchify): the
    # solver-carry layout of the sampling/rollout scans — tokens on sp like
    # the in-block stream, so the loop body has NO layout boundary (the
    # video<->token reshard SPMD can only do by full rematerialization)
    token_cells: P = P(DATA_AXIS, SP_AXIS, None, None)
    # [L, Dh] RoPE cos/sin tables: REPLICATED. They are small (~10 MB bf16
    # at 75.6k tokens) and broadcast against the token stream; leaving them
    # unpinned lets SPMD back-propagate attention-reshape shardings onto the
    # broadcast and fall back to involuntary full rematerialization per
    # layer (observed under hybrid_full FSDP), while token-sharding them
    # creates MORE reshard boundaries in the backward.
    rope_tables: P = P(None, None)
    # [B, ...] per-sample scalars/vectors
    batch: P = P(DATA_AXIS)
    # use the explicit shard_map Ulysses path in self-attention instead of
    # GSPMD constraints (both engage the Pallas flash kernel on TPU — GSPMD
    # via the custom_partitioning wrapper, ops/flash_sharded.py)
    shard_map_ulysses: bool = False
    # USP inference: self-attention via ring x ulysses shard_map
    # (ops/ring_attention.usp_attention); tokens sharded over both axes
    usp: bool = False


def usp_policy() -> ShardingPolicy:
    """Policy for a ("data", "ring", "sp") USP mesh: sequence dims shard
    over ring x ulysses jointly."""
    seq = (RING_AXIS, SP_AXIS)
    return ShardingPolicy(
        tokens=P(DATA_AXIS, seq, None),
        attn_heads=P(DATA_AXIS, None, SP_AXIS, None),
        attn_heads_sp_tokens=P(DATA_AXIS, seq, None, None),
        video=P(DATA_AXIS, None, None, seq, None),
        token_cells=P(DATA_AXIS, seq, None, None),
        usp=True,
    )


def constrain(x, policy: Optional[ShardingPolicy], spec_name: str):
    """Apply a named sharding constraint if a policy is active."""
    if policy is None:
        return x
    return jax.lax.with_sharding_constraint(x, getattr(policy, spec_name))


def prune_uneven(x, spec: P) -> P:
    """`spec` with entries dropped on dims the current mesh cannot divide
    evenly (e.g. batch 1 constrained to a data=2 axis — a single serving
    sample on a multi-replica mesh). Eager with_sharding_constraint rejects
    uneven shardings outright, and even under jit an uneven boundary
    sharding buys nothing; replicating that dim is the graceful fallback.
    No-op when no mesh is set."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape:
        return spec
    out = []
    for dim, part in zip(x.shape, tuple(spec) + (None,) * (x.ndim - len(spec))):
        if part is None:
            out.append(None)
            continue
        n = 1
        for a in (part if isinstance(part, tuple) else (part,)):
            n *= mesh.shape.get(a, 1)
        out.append(part if n and dim % n == 0 else None)
    return P(*out)


def constrain_even(x, spec: P):
    """with_sharding_constraint, uneven dims degraded to replicated
    (prune_uneven). The boundary-conversion helpers use this so they are
    safe both inside jit and eagerly, at any batch size."""
    return jax.lax.with_sharding_constraint(x, prune_uneven(x, spec))


# FSDP strategy surface (reference fsdp_utils.py:86-101, config key
# model.fsdp.fsdp_sharding_startegy [sic]): which mesh axes parameters and
# optimizer moments shard over.
#   full          — params + moments sharded over ALL devices (ZeRO-3).
#                   Right on a single ICI slice; on a DCN-connected
#                   multi-slice "data" axis every layer's weight all-gather
#                   would cross DCN.
#   hybrid_full   — params + moments sharded over the intra-slice "sp"/ICI
#                   axis, REPLICATED across "data" (the reference's
#                   HYBRID_SHARD): per-layer weight all-gathers ride ICI;
#                   only the once-per-step gradient all-reduce crosses DCN.
#   shard_grad_op — params replicated, moments (and hence the update
#                   dataflow: grad reduce-scatter + param all-gather)
#                   sharded over ALL devices (the reference's
#                   SHARD_GRAD_OP / ZeRO-2).
#   hybrid_zero2  — params replicated, moments sharded over "sp" only.
#   none          — everything replicated (DDP / NO_SHARD).
FSDP_STRATEGIES = ("full", "hybrid_full", "shard_grad_op", "hybrid_zero2",
                   "none")


def _strategy_axes(mesh: Mesh, strategy: str):
    """Mesh axes a strategy shards over: "full"-style = ALL mesh axes
    (on a USP ("data","ring","sp") mesh the ring axis counts too — leaving
    it out would replicate weights x ring for no bandwidth gain);
    "hybrid"-style = every axis EXCEPT the cross-slice "data" axis."""
    if strategy in ("full", "shard_grad_op"):
        return tuple(mesh.axis_names)
    return tuple(a for a in mesh.axis_names if a != DATA_AXIS)


_PARAM_STRATEGIES = ("full", "hybrid_full")
_MOMENT_STRATEGIES = ("full", "hybrid_full", "shard_grad_op",
                      "hybrid_zero2")


def _fsdp_spec_fn(mesh: Mesh, axes, min_size: int):
    """Largest-suitable-axis sharding rule over the given mesh axes."""
    n_dev = 1
    for a in axes:
        n_dev *= mesh.shape[a]
    axes = tuple(axes) if len(axes) > 1 else axes[0]

    def spec_for(x):
        if x.size < min_size or n_dev == 1:
            return NamedSharding(mesh, P())
        shape = x.shape
        # broadcast-style params (any singleton dim, e.g. adaLN modulation
        # [L, 1, 6, dim]) stay replicated: sharding them forces per-layer
        # reshards against the replicated time embedding they are added to
        if 1 in shape:
            return NamedSharding(mesh, P())
        # prefer TRAILING feature axes and never shard axis 0 of stacked
        # per-layer params (rank >= 3): the nn.scan slices axis 0 per layer,
        # and sharding it forces an SPMD reshard inside the loop body
        start = 1 if len(shape) >= 3 else 0
        for i in reversed(range(start, len(shape))):
            if shape[i] % n_dev == 0:
                spec = [None] * len(shape)
                spec[i] = axes
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return spec_for


def opt_state_shardings(mesh: Mesh, param_shapes, param_shardings, tx,
                        strategy: str = "full", min_size: int = 2 ** 16):
    """(device, pinned_host) sharding trees for tx.init(params)' state.

    Adam moments mirror the parameter tree. Under "full"/"hybrid_full"
    (and "none") a moment leaf matching a parameter (shape, dtype) reuses
    that parameter's sharding; under the zero2-style strategies
    ("shard_grad_op", "hybrid_zero2") params are replicated but moments
    still shard (fsdp_utils.py SHARD_GRAD_OP: grads+opt state sharded,
    weights gathered), so moment leaves get their own FSDP-style shardings
    over the strategy's axes. The host tree is the same shardings with
    memory_kind='pinned_host' — the storage side of optimizer-state offload
    (SURVEY 5.7: the 14B HBM budget keeps only params + activations
    resident; moments stream in per step)."""
    import jax

    opt_shapes = jax.eval_shape(tx.init, param_shapes)
    flat_s = jax.tree_util.tree_leaves(param_shapes)
    flat_sh = jax.tree_util.tree_leaves(param_shardings)
    by_shape = {(s.shape, s.dtype): sh for s, sh in zip(flat_s, flat_sh)}
    zero2 = strategy in ("shard_grad_op", "hybrid_zero2")
    moment_spec = (_fsdp_spec_fn(mesh, _strategy_axes(mesh, strategy),
                                 min_size)
                   if zero2 else None)

    def dev_for(s):
        hit = by_shape.get((s.shape, s.dtype))
        if hit is None:
            return NamedSharding(mesh, P())
        return moment_spec(s) if zero2 else hit

    dev = jax.tree.map(dev_for, opt_shapes)
    host = jax.tree.map(lambda sh: sh.with_memory_kind("pinned_host"), dev)
    if hasattr(host, "acc_grads"):
        # gradient accumulation (optax.MultiSteps, the reference's 720p
        # configs run gradient_accumulation_steps=5): the param-sized
        # acc_grads tree is read+written EVERY micro-step, so pinning it
        # host-side buys nothing and streams ~3 param-sized trees through
        # HBM per micro-step — the 14B audit measured 115.9 GB/dev peak
        # (v5p overflow) with the whole state offloaded vs the AdamW
        # moments (touched every k-th step) alone. Keep acc_grads
        # device-resident in the "host" tree.
        host = host._replace(acc_grads=dev.acc_grads)
    return dev, host


def fsdp_param_sharding(mesh: Mesh, params, min_size: int = 2 ** 16,
                        strategy: str = "full"):
    """FSDP-style NamedShardings for a param pytree under a strategy
    (FSDP_STRATEGIES above; reference fsdp_utils.py:86-101).

    "full" shards the largest suitable axis of each tensor over all mesh
    devices (both axes flattened), mirroring ZeRO-3's flat-parameter
    sharding (fsdp_utils.py:86-96); "hybrid_full" shards over "sp" only;
    zero2-style strategies and "none" replicate params (their moments
    shard via opt_state_shardings). Small tensors stay replicated.
    """
    assert strategy in FSDP_STRATEGIES, (
        f"unknown fsdp strategy {strategy!r}; expected {FSDP_STRATEGIES}")
    if strategy not in _PARAM_STRATEGIES:  # zero2-style / none: replicated
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    spec_for = _fsdp_spec_fn(mesh, _strategy_axes(mesh, strategy), min_size)
    return jax.tree.map(spec_for, params)
