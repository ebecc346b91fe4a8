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
        usp=True,
    )


def constrain(x, policy: Optional[ShardingPolicy], spec_name: str):
    """Apply a named sharding constraint if a policy is active."""
    if policy is None:
        return x
    return jax.lax.with_sharding_constraint(x, getattr(policy, spec_name))


def opt_state_shardings(mesh: Mesh, param_shapes, param_shardings, tx):
    """(device, pinned_host) sharding trees for tx.init(params)' state.

    Adam moments mirror the parameter tree: leaves matching a parameter
    (shape, dtype) reuse its FSDP sharding; scalars/counters replicate.
    The host tree is the same shardings with memory_kind='pinned_host' —
    the storage side of optimizer-state offload (SURVEY 5.7: the 14B HBM
    budget keeps only params + activations resident; moments stream in
    per step)."""
    import jax

    opt_shapes = jax.eval_shape(tx.init, param_shapes)
    flat_s = jax.tree_util.tree_leaves(param_shapes)
    flat_sh = jax.tree_util.tree_leaves(param_shardings)
    by_shape = {(s.shape, s.dtype): sh for s, sh in zip(flat_s, flat_sh)}

    def dev_for(s):
        return by_shape.get((s.shape, s.dtype), NamedSharding(mesh, P()))

    dev = jax.tree.map(dev_for, opt_shapes)
    host = jax.tree.map(lambda sh: sh.with_memory_kind("pinned_host"), dev)
    return dev, host


def fsdp_param_sharding(mesh: Mesh, params, min_size: int = 2 ** 16):
    """FSDP-style NamedShardings for a param pytree.

    Shards the largest axis of each tensor over all mesh devices (both axes
    flattened), mirroring ZeRO-3's flat-parameter sharding
    (fsdp_utils.py:86-96). Small tensors stay replicated.
    """
    n_dev = mesh.devices.size

    def spec_for(x):
        if x.size < min_size:
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
                spec[i] = (DATA_AXIS, SP_AXIS)
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)
