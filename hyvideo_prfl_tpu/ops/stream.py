"""Fused LayerNorm + scale/shift Pallas kernel (fwd + custom VJP).

The DiT block's fp32 residual stream runs three LayerNorm(+adaLN modulate /
affine) passes between the matmul custom calls (reference model.py:339-358):

    h = LN(x) * (1 + e_scale) + e_shift      (pre-self-attn, pre-ffn, head)
    h = LN(x) * scale + bias                 (norm3, cross-attn path)

Measured on the real chip at the 14B Ulysses shard ([1, 18900, 5120] fp32,
scripts/profile_block_elementwise.py): ONE such pass costs 13.1 ms in XLA —
14x the 0.95 ms fp32 read+write roofline — because the lowering runs the
mean/variance reductions and the normalize/modulate chain as separate HBM
round-trips. Three passes per block is ~39 ms of a 130 ms block forward.

This kernel does one read of x (fp32) and one write of the output (bf16 for
block call sites, fp32 for the head): mean/var/normalize/modulate all happen
in VMEM per [block_l, D] tile. Both modulate flavors are one op,

    out = LN(x; eps) * s + t        s, t: [B, D] fp32,

with s = 1 + e_scale (adaLN, per-batch) or s = broadcast(scale) (affine,
per-feature); the tiny [B, D] precompute stays in XLA.

Backward (recompute-stats, residuals = layer inputs only):

    yn  = (x - mean) * rstd
    dyn = g * s
    dx  = rstd * (dyn - mean_D(dyn) - yn * mean_D(dyn * yn))
    ds  = sum_BL g * yn      dt = sum_BL g

ds/dt accumulate as per-tile partials (sublane sums through the MXU via a
ones-row matmul, as in qknorm_rope.py) and reduce outside.

Multi-chip: custom_partitioning with rule "b l d, b d, b d -> b l d" —
batch/sequence partition freely (each row is independent); the feature dim
replicates. The multi-chip backward stays in XLA (ds/dt need a cross-shard
sum custom_partitioning cannot express), mirroring qknorm_rope.py.

Reference parity: wan/modules/model.py:339-358 (WanAttentionBlock fp32 adaLN
modulation + norms) and :383-389 (Head modulation).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

MAX_BLOCK_BYTES = 3 << 20


def pick_block_l(l: int, d: int, row_bytes: int = 4) -> int:
    """Multiple-of-8 block length whose [bl, d] working set fits the VMEM
    budget. Prefers an exact divisor of l; when l has no multiple-of-8
    divisor (the 14B Ulysses shard 18,900 = 2^2*3^3*5^2*7) the largest
    fitting multiple of 8 is used with a cdiv grid — the trailing block
    reads garbage rows (each row is independent), their writes are masked
    by Pallas, and the backward's cross-row partial sums mask them
    explicitly. Returns 0 when nothing fits (caller uses the XLA ref)."""
    cap = min(MAX_BLOCK_BYTES // (d * row_bytes), l)
    if cap < 8:
        return 0
    for bl in range(cap - cap % 8, 7, -8):
        if l % bl == 0:
            return bl
    return cap - cap % 8


def _fwd_kernel(x_ref, s_ref, t_ref, o_ref, *, eps, inv_d):
    x = x_ref[0].astype(jnp.float32)                    # [BL, D]
    mean = jnp.sum(x, axis=1, keepdims=True) * inv_d
    xc = x - mean
    var = jnp.sum(xc * xc, axis=1, keepdims=True) * inv_d
    yn = xc * jax.lax.rsqrt(var + eps)
    o_ref[0] = (yn * s_ref[0] + t_ref[0]).astype(o_ref.dtype)


def _bwd_kernel(x_ref, s_ref, g_ref, dx_ref, ds_ref, dt_ref,
                *, eps, inv_d, bl, l):
    x = x_ref[0].astype(jnp.float32)                    # [BL, D]
    g = g_ref[0].astype(jnp.float32)
    mean = jnp.sum(x, axis=1, keepdims=True) * inv_d
    xc = x - mean
    var = jnp.sum(xc * xc, axis=1, keepdims=True) * inv_d
    rstd = jax.lax.rsqrt(var + eps)
    yn = xc * rstd
    dyn = g * s_ref[0]
    m1 = jnp.sum(dyn, axis=1, keepdims=True) * inv_d
    m2 = jnp.sum(dyn * yn, axis=1, keepdims=True) * inv_d
    dx_ref[0] = (rstd * (dyn - m1 - yn * m2)).astype(dx_ref.dtype)
    gyn = g * yn
    if l % bl:
        # ragged trailing block: the garbage rows' dx writes are masked by
        # Pallas, but the cross-row ds/dt partials must exclude them (the
        # where also scrubs any NaNs the garbage stats produced)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bl, 1), 0)
        valid = rows < (l - pl.program_id(1) * bl)
        gyn = jnp.where(valid, gyn, 0.0)
        g = jnp.where(valid, g, 0.0)
    ones = jnp.ones((1, x.shape[0]), jnp.float32)       # sublane sum via MXU
    ds_ref[0, 0, 0] = jax.lax.dot_general(
        ones, gyn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    dt_ref[0, 0, 0] = jax.lax.dot_general(
        ones, g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]


def _interpret() -> bool:
    from .flash_attention import _interpret as fa_interpret

    return fa_interpret()


def _fwd_call(x, s, t, eps, out_dtype, bl):
    b, l, d = x.shape
    grid = (b, pl.cdiv(l, bl))
    # s/t carry a singleton middle axis so their block's last-two dims are
    # (1, d) of a (b, 1, d) array — a (1, d) block of a (b, d) array is
    # REJECTED by Mosaic whenever b > 1 (neither 8-divisible nor full;
    # caught on hardware at batch 2, the batched-CFG serving path)
    s3 = s.reshape(b, 1, d)
    t3 = t.reshape(b, 1, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, inv_d=1.0 / d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bl, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bl, d), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(x, s3, t3)


def _bwd_call(x, s, g, eps, bl):
    b, l, d = x.shape
    nblk = pl.cdiv(l, bl)
    grid = (b, nblk)
    s3 = s.reshape(b, 1, d)  # see _fwd_call: (1, d) blocks of (b, d) fail b>1
    dx, ds_part, dt_part = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, inv_d=1.0 / d, bl=bl, l=l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bl, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, bl, d), lambda b_, i: (b_, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bl, d), lambda b_, i: (b_, i, 0)),
            # partials carry a singleton sublane axis: Mosaic requires the
            # block's last-two dims be (8k, 128k) or FULL — (1, 1, d) blocks
            # of a (b, nblk, d) array are rejected, (1, 1, 1, d) of
            # (b, nblk, 1, d) lower fine (probe: /tmp lowering check)
            pl.BlockSpec((1, 1, 1, d), lambda b_, i: (b_, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, d), lambda b_, i: (b_, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, nblk, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nblk, 1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(x, s3, g)
    return dx, ds_part, dt_part


def _xla_ref(x, s, t, eps, out_dtype):
    """Unfused reference, identical math (wan_dit._layer_norm + modulate)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    yn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (yn * s[:, None, :] + t[:, None, :]).astype(out_dtype)


# ---- local (per-shard) op with custom VJP ----------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _local(x, s, t, eps, out_dtype):
    bl = pick_block_l(x.shape[1], x.shape[2])
    return _fwd_call(x, s, t, eps, out_dtype, bl)


def _local_fwd(x, s, t, eps, out_dtype):
    return _local(x, s, t, eps, out_dtype), (x, s)


def _local_bwd(eps, out_dtype, res, g):
    x, s = res
    # backward holds x, g, dyn, yn, dx live per tile: halve the block budget
    bl = pick_block_l(x.shape[1], x.shape[2], row_bytes=12)
    if bl == 0:
        _, vjp = jax.vjp(
            lambda x_, s_, t_: _xla_ref(x_, s_, t_, eps, out_dtype),
            x, s, jnp.zeros_like(s))
        return vjp(g)
    dx, ds_part, dt_part = _bwd_call(x, s, g, eps, bl)
    return dx, jnp.sum(ds_part[:, :, 0], axis=1), jnp.sum(dt_part[:, :, 0], axis=1)


_local.defvjp(_local_fwd, _local_bwd)


# ---- GSPMD-partitionable wrapper --------------------------------------------


def _norm_spec(sharding, rank):
    spec = tuple(sharding.spec) if sharding is not None else ()
    return spec + (None,) * (rank - len(spec))


def _make_cp(eps, out_dtype):
    def fn(x, s, t):
        if pick_block_l(x.shape[1], x.shape[2]) > 0:
            return _local(x, s, t, eps, out_dtype)
        return _xla_ref(x, s, t, eps, out_dtype)

    def partition(mesh, arg_shapes, result_shape):
        xs = _norm_spec(arg_shapes[0].sharding, 3)
        b_ax, l_ax = xs[0], xs[1]
        xsh = NamedSharding(mesh, P(b_ax, l_ax, None))
        ssh = NamedSharding(mesh, P(b_ax, None))
        return mesh, fn, xsh, (xsh, ssh, ssh)

    def infer(mesh, arg_shapes, result_shape):
        xs = _norm_spec(arg_shapes[0].sharding, 3)
        return NamedSharding(mesh, P(xs[0], xs[1], None))

    cp = custom_partitioning(fn)
    cp.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule="b l d, b d, b d -> b l d",
                     need_replication_factors=("d",))
    return cp


_CP_CACHE = {}


def _get_cp(eps, out_dtype):
    key = (eps, jnp.dtype(out_dtype).name)
    if key not in _CP_CACHE:
        _CP_CACHE[key] = _make_cp(eps, out_dtype)
    return _CP_CACHE[key]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sharded(x, s, t, eps, out_dtype):
    return _get_cp(eps, out_dtype)(x, s, t)


def _sharded_fwd(x, s, t, eps, out_dtype):
    return _sharded(x, s, t, eps, out_dtype), (x, s)


def _sharded_bwd(eps, out_dtype, res, g):
    # multi-chip backward in XLA: ds/dt need a psum over sequence shards,
    # which custom_partitioning cannot express (see qknorm_rope._sharded_bwd)
    x, s = res
    _, vjp = jax.vjp(
        lambda x_, s_, t_: _xla_ref(x_, s_, t_, eps, out_dtype),
        x, s, jnp.zeros_like(s))
    return vjp(g)


_sharded.defvjp(_sharded_fwd, _sharded_bwd)


# ---- public API -------------------------------------------------------------


def ln_scale_shift(x, s, t, eps: float = 1e-6, out_dtype=jnp.bfloat16):
    """Fused LayerNorm(x) * s + t over the feature dim.

    x: [B, L, D] (fp32 residual stream); s, t: [B, D], [1, D] or [D], fp32
    (precompute 1 + e_scale for adaLN call sites). Returns [B, L, D] in
    out_dtype. Falls back to identical unfused XLA math on TPU-unfriendly
    shapes, on CPU, and when HYV_FUSED_LN=0."""
    b, l, d = x.shape
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32).reshape(-1, d), (b, d))
    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1, d), (b, d))
    cpu_skip = _interpret() and os.environ.get("PALLAS_INTERPRET") != "1"
    ok = (
        d % 128 == 0
        and pick_block_l(l, d) > 0
        and not cpu_skip
        and os.environ.get("HYV_FUSED_LN") != "0"
    )
    if not ok:
        return _xla_ref(x, s, t, eps, out_dtype)
    from .attention import multichip_context

    if multichip_context():
        if os.environ.get("HYV_NO_CUSTOM_PARTITIONING") == "1":
            # chipless AOT compiles cannot emit custom_partitioning
            # callbacks; the unfused math is the memory upper bound there
            return _xla_ref(x, s, t, eps, out_dtype)
        return _sharded(x, s, t, eps, out_dtype)
    return _local(x, s, t, eps, out_dtype)
