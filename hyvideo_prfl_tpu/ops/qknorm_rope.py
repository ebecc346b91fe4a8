"""Fused qk-RMSNorm + 3D-RoPE Pallas kernel (fwd + custom VJP).

The DiT's #1 non-matmul cost: the reference applies RMSNorm then rotary
embedding to q and k in every self-attention (model.py:138-201). As separate
XLA ops the chain runs at ~126 GB/s — measured 12.2 ms of a 36 ms forward at
dim 1280 / 3120 tokens (scripts/profile_step2.py), because each stage round-
trips [B, L, N, D] through HBM with fp32 upcasts.

Layout contract (chosen for Mosaic tiling, NOT the torch module order):
  in  x [B, L, N*D]   — the q/k projection output, natural (8,128) tiles;
                        per-head slices are 128-aligned LANE slices (free)
  out   [B, N, L, D]  — per-head [bl, D] tiles; this is the flash-attention
                        kernel's preferred layout, so the fusion also absorbs
                        the BLND->BNLD transpose the attention path paid.
All math is per-head 2D: Mosaic rejects rank-3 singleton reductions, and a
[bl, N, D] block layout wastes (N=10 -> 16)-sublane padding. Sublane (axis-0)
sums lower through the MXU (ones-row matmul) — vector.multi_reduction over
sublanes does not compile on current Mosaic.

Math (bit-matching the unfused path in models/wan_dit.py + models/rope.py):

    r   = rsqrt(mean(x^2 over (N,D)) + eps)         fp32
    t   = bf16(x * r) * bf16(w)                     (RMSNorm: _rms_norm)
    out = bf16(f32(t) * C + roll(f32(t), D/2) * S)  (rolled rope formulation)

with expanded tables C = [cos|cos], S = [-sin|sin] of shape [L, D]
(models/rope.py rope_tables_rolled). The norm is over the FULL model dim
(all heads), so the head axis cannot shard; tokens and batch can.

Backward (recompute-r, no extra residuals beyond the layer input):
    du = g * C + roll(g, D/2) * roll(S, D/2)        (rope is linear)
    dt = du * w;   dw = sum_{b,l} du * t
    dx = r * dt - x * r^3 * mean(dt * x over (N,D))

Multi-chip: wrapped in custom_partitioning with rule
"b l m, n d, l d, l d -> b n l d" — batch/sequence partition freely (the
table's L axis shards with x's, so each device reads its own positions);
heads/head_dim replicate. The multi-chip BACKWARD stays in XLA: a Pallas dw
kernel would need a cross-shard sum custom_partitioning cannot express.

Reference parity: wan/modules/model.py:138-201 (WanSelfAttention norm_q/
norm_k + rope_apply).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

MAX_BLOCK_BYTES = 3 << 20  # fp32 working-set cap per [bl, N*D] block


def _interpret() -> bool:
    from .flash_attention import _interpret as fa_interpret

    return fa_interpret()


def pick_block_l(l: int, n: int, d: int) -> int:
    """Multiple-of-8 block length whose fp32 working set fits the VMEM
    budget; 0 when none fits (caller falls back to XLA). Prefers an exact
    divisor of l; when l has no multiple-of-8 divisor (the 14B Ulysses
    shard 18,900 = 2^2*3^3*5^2*7 — measured 13 ms/pass through the unfused
    XLA fallback before this path, scripts/profile_stream_fused.py) the
    largest fitting multiple of 8 runs under a cdiv grid: Mosaic masks the
    trailing block's writes and the backward masks its rows out of the
    cross-row dw partials. Odd exact divisors (150 | 18,900) are NOT
    usable — Mosaic requires block dims be multiples of (8, 128) or the
    full array dim (probed on hardware)."""
    cap = min(MAX_BLOCK_BYTES // (n * d * 4), l)
    if cap < 8:
        return 0
    for bl in range(cap - cap % 8, 7, -8):
        if l % bl == 0:
            return bl
    return cap - cap % 8


def _fwd_kernel(x_ref, w_ref, c_ref, s_ref, o_ref, *, eps, half, do_rope,
                inv_m, n, d):
    x2 = x_ref[0]                                     # [BL, N*D]
    ms = None
    for i in range(n):
        xi = x2[:, i * d:(i + 1) * d].astype(jnp.float32)
        s2 = jnp.sum(xi * xi, axis=1, keepdims=True)  # [BL, 1]
        ms = s2 if ms is None else ms + s2
    r = jax.lax.rsqrt(ms * inv_m + eps)               # [BL, 1]
    c = c_ref[:]                                      # [BL, D]
    s = s_ref[:]
    for i in range(n):
        xi = x2[:, i * d:(i + 1) * d].astype(jnp.float32)
        t = (xi * r).astype(o_ref.dtype) * \
            w_ref[i:i + 1, :].astype(o_ref.dtype)
        if do_rope:
            tf = t.astype(jnp.float32)
            t = (tf * c + pltpu.roll(tf, half, 1) * s).astype(o_ref.dtype)
        o_ref[0, i] = t                               # [BL, D]


def _bwd_kernel(x_ref, w_ref, c_ref, sb_ref, g_ref, dx_ref, dw_ref,
                *, eps, half, do_rope, inv_m, n, d, bl, l):
    x2 = x_ref[0]                                     # [BL, N*D]
    c = c_ref[:]
    sb = sb_ref[:]                                    # roll(S, D/2)
    if l % bl:
        # ragged trailing block: garbage rows' dx writes are masked by
        # Pallas, but the cross-row dw partials must exclude them (the
        # where also scrubs NaNs the garbage stats produce)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bl, 1), 0)
        valid = rows < (l - pl.program_id(1) * bl)
    else:
        valid = None
    dus, ms, dot = [], None, None
    for i in range(n):
        xi = x2[:, i * d:(i + 1) * d].astype(jnp.float32)
        gi = g_ref[0, i].astype(jnp.float32)          # [BL, D]
        du = gi * c + pltpu.roll(gi, half, 1) * sb if do_rope else gi
        dus.append(du)
        wi = w_ref[i:i + 1, :].astype(jnp.float32)
        s2 = jnp.sum(xi * xi, axis=1, keepdims=True)
        ms = s2 if ms is None else ms + s2
        d2 = jnp.sum(du * wi * xi, axis=1, keepdims=True)
        dot = d2 if dot is None else dot + d2
    r = jax.lax.rsqrt(ms * inv_m + eps)               # [BL, 1]
    r3dot = (r * r * r) * (dot * inv_m)
    ones = jnp.ones((1, x2.shape[0]), jnp.float32)    # sublane sum via MXU
    dws = []
    for i in range(n):
        xi = x2[:, i * d:(i + 1) * d].astype(jnp.float32)
        wi = w_ref[i:i + 1, :].astype(jnp.float32)
        dt = dus[i] * wi
        dx_ref[0, :, i * d:(i + 1) * d] = (
            r * dt - xi * r3dot).astype(dx_ref.dtype)
        # t as the forward computes it (bf16 rounding included)
        ti = (xi * r).astype(g_ref.dtype).astype(jnp.float32)
        duti = dus[i] * ti
        if valid is not None:
            duti = jnp.where(valid, duti, 0.0)
        dws.append(jax.lax.dot_general(
            ones, duti, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))      # [1, D]
    dw_ref[0, 0] = jnp.concatenate(dws, axis=0)       # [N, D] partial


def _fwd_call(x, w, c_tab, s_tab, eps, do_rope, bl):
    b, l, m = x.shape
    n, d = w.shape
    grid = (b, pl.cdiv(l, bl))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, half=d // 2,
                          do_rope=do_rope, inv_m=1.0 / m, n=n, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bl, m), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((n, d), lambda b_, i: (0, 0)),
            pl.BlockSpec((bl, d), lambda b_, i: (i, 0)),
            pl.BlockSpec((bl, d), lambda b_, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, bl, d), lambda b_, i: (b_, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, l, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(x, w, c_tab, s_tab)


def _bwd_call(x, w, c_tab, s_bwd, g, eps, do_rope, bl):
    b, l, m = x.shape
    n, d = w.shape
    nblk = pl.cdiv(l, bl)
    grid = (b, nblk)
    dx, dw_part = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, half=d // 2,
                          do_rope=do_rope, inv_m=1.0 / m, n=n, d=d,
                          bl=bl, l=l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bl, m), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((n, d), lambda b_, i: (0, 0)),
            pl.BlockSpec((bl, d), lambda b_, i: (i, 0)),
            pl.BlockSpec((bl, d), lambda b_, i: (i, 0)),
            pl.BlockSpec((1, n, bl, d), lambda b_, i: (b_, 0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bl, m), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, 1, n, d), lambda b_, i: (b_, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, nblk, n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(x, w, c_tab, s_bwd, g)
    return dx, dw_part


# ---- local (per-shard) op with custom VJP ----------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _local(x, w, c_tab, s_tab, eps, do_rope):
    bl = pick_block_l(x.shape[1], w.shape[0], w.shape[1])
    return _fwd_call(x, w, c_tab, s_tab, eps, do_rope, bl)


def _local_fwd(x, w, c_tab, s_tab, eps, do_rope):
    return _local(x, w, c_tab, s_tab, eps, do_rope), (x, w, c_tab, s_tab)


def _local_bwd(eps, do_rope, res, g):
    x, w, c_tab, s_tab = res
    half = w.shape[1] // 2
    s_bwd = jnp.roll(s_tab, half, axis=-1)
    # the backward holds ~2x the forward's per-block working set (the du
    # accumulators + x + dx + g live simultaneously): halve the block
    # budget by doubling the per-row byte estimate. At bl from the fwd
    # budget Mosaic ran 76 KB over the 16 MB scoped-VMEM stack at
    # [1, 3120, 10x128] (bench-scale cross-attn with a flash-produced
    # head-major cotangent).
    bl = pick_block_l(x.shape[1], w.shape[0], 2 * w.shape[1])
    if bl == 0:  # no small-enough divisor: identical math via XLA
        _, vjp = jax.vjp(
            lambda x_, w_: _xla_ref(x_, w_, c_tab, s_tab, eps, do_rope),
            x, w)
        dx, dw = vjp(g)
        return dx, dw, None, None
    dx, dw_part = _bwd_call(x, w, c_tab, s_bwd, g, eps, do_rope, bl)
    dw = jnp.sum(dw_part, axis=(0, 1))
    return dx, dw, None, None


_local.defvjp(_local_fwd, _local_bwd)


# ---- GSPMD-partitionable wrapper --------------------------------------------


def _norm_spec(sharding, rank):
    spec = tuple(sharding.spec) if sharding is not None else ()
    return spec + (None,) * (rank - len(spec))


def _make_cp(eps, do_rope):
    def fn(x, w, c_tab, s_tab):
        # invoked with PER-SHARD shapes when partitioned: fall back to the
        # identical XLA math when the local sequence doesn't block evenly
        if pick_block_l(x.shape[1], w.shape[0], w.shape[1]) > 0:
            return _local(x, w, c_tab, s_tab, eps, do_rope)
        return _xla_ref(x, w, c_tab, s_tab, eps, do_rope)

    def partition(mesh, arg_shapes, result_shape):
        xs = _norm_spec(arg_shapes[0].sharding, 3)
        b_ax, l_ax = xs[0], xs[1]
        xsh = NamedSharding(mesh, P(b_ax, l_ax, None))
        wsh = NamedSharding(mesh, P(None, None))
        tsh = NamedSharding(mesh, P(l_ax, None))
        osh = NamedSharding(mesh, P(b_ax, None, l_ax, None))
        return mesh, fn, osh, (xsh, wsh, tsh, tsh)

    def infer(mesh, arg_shapes, result_shape):
        xs = _norm_spec(arg_shapes[0].sharding, 3)
        return NamedSharding(mesh, P(xs[0], None, xs[1], None))

    cp = custom_partitioning(fn)
    cp.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule="b l m, n d, l d, l d -> b n l d",
                     need_replication_factors=("m", "n", "d"))
    return cp


_CP_CACHE = {}


def _get_cp(eps, do_rope):
    key = (eps, do_rope)
    if key not in _CP_CACHE:
        _CP_CACHE[key] = _make_cp(eps, do_rope)
    return _CP_CACHE[key]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sharded(x, w, c_tab, s_tab, eps, do_rope):
    return _get_cp(eps, do_rope)(x, w, c_tab, s_tab)


def _sharded_fwd(x, w, c_tab, s_tab, eps, do_rope):
    return _sharded(x, w, c_tab, s_tab, eps, do_rope), (x, w, c_tab, s_tab)


def _sharded_bwd(eps, do_rope, res, g):
    # Multi-chip backward stays in XLA: a Pallas dw kernel would need a
    # cross-shard sum that custom_partitioning cannot express (a replicated
    # output must be identical per shard, and per-shard dw partials are
    # not). XLA differentiates the identical unfused math and GSPMD inserts
    # the psum over the sequence shards.
    x, w, c_tab, s_tab = res
    _, vjp = jax.vjp(
        lambda x_, w_: _xla_ref(x_, w_, c_tab, s_tab, eps, do_rope), x, w)
    dx, dw = vjp(g)
    return dx, dw, None, None


_sharded.defvjp(_sharded_fwd, _sharded_bwd)


# ---- public API -------------------------------------------------------------


def rmsnorm_rope(x: jnp.ndarray, w: jnp.ndarray, c_tab: jnp.ndarray,
                 s_tab: jnp.ndarray, num_heads: int,
                 eps: float = 1e-6) -> jnp.ndarray:
    """Fused full-dim RMSNorm + rolled-table rope.

    x: [B, L, dim] (the q/k projection output); w: [dim]; tables [L, D].
    Returns [B, N, L, D] (the flash kernel's head-major layout). Falls back
    to identical unfused XLA math on TPU-unfriendly shapes."""
    return _dispatch(x, w, c_tab, s_tab, num_heads, eps, do_rope=True)


def rmsnorm_only(x: jnp.ndarray, w: jnp.ndarray, num_heads: int,
                 eps: float = 1e-6) -> jnp.ndarray:
    """Fused full-dim RMSNorm over [B, L, dim] -> [B, N, L, D] (the
    cross-attention q/k norms, which have no rope)."""
    l, d = x.shape[1], x.shape[2] // num_heads
    z = jnp.zeros((l, d), jnp.float32)
    return _dispatch(x, w, z, z, num_heads, eps, do_rope=False)


def _xla_ref(x, w, c_tab, s_tab, eps, do_rope):
    """Unfused reference (identical math), used off-TPU and in tests.
    x [B, L, N*D], w [N, D] -> [B, N, L, D]."""
    b, l, m = x.shape
    n, d = w.shape
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=2, keepdims=True)
    t = (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * \
        w.reshape(1, 1, m).astype(x.dtype)
    t = t.reshape(b, l, n, d)
    if do_rope:
        tf = t.astype(jnp.float32)
        half = d // 2
        rolled = jnp.concatenate([tf[..., half:], tf[..., :half]], axis=-1)
        t = (tf * c_tab[None, :, None, :]
             + rolled * s_tab[None, :, None, :]).astype(x.dtype)
    return jnp.moveaxis(t, 2, 1)


def _dispatch(x, w, c_tab, s_tab, num_heads, eps, do_rope):
    import os

    b, l, m = x.shape
    n = num_heads
    d = m // n
    w = w.reshape(n, d)
    # CPU backends take the identical unfused XLA math: interpret-mode
    # pallas is orders of magnitude slower and the kernels have dedicated
    # coverage (tests/test_qknorm_rope.py forces the kernel path with
    # PALLAS_INTERPRET=1)
    cpu_skip = _interpret() and os.environ.get("PALLAS_INTERPRET") != "1"
    ok = d % 128 == 0 and pick_block_l(l, n, d) > 0 and not cpu_skip
    if not ok:
        return _xla_ref(x, w, c_tab, s_tab, eps, do_rope)
    c_tab = c_tab.astype(jnp.float32)
    s_tab = s_tab.astype(jnp.float32)
    from .attention import multichip_context

    if multichip_context():
        import os

        if os.environ.get("HYV_NO_CUSTOM_PARTITIONING") == "1":
            # chipless AOT compiles (scripts/memory_audit_14b.py) have no
            # emitter for custom_partitioning callbacks; the unfused XLA
            # math is a conservative memory upper bound there
            return _xla_ref(x, w, c_tab, s_tab, eps, do_rope)
        return _sharded(x, w, c_tab, s_tab, eps, do_rope)
    return _local(x, w, c_tab, s_tab, eps, do_rope)
