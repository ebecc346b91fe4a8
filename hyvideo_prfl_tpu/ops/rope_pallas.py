"""Pallas rope kernel: rotation as two FMAs and a lane roll.

The XLA lowering of rotary embeddings is relayout-bound: any formulation
that slices the lane (last) dimension (adjacent pairs OR halves) forces
sublane/lane shuffles, measured ~0.6 ms per [3584, 10, 128] application on
v5e — 48 applications per 24-block forward is a third of the DiT runtime.

This kernel never slices lanes: with expanded tables
    C = [cos | cos],  S = [-sin | sin]            (shape [L, D])
the half-layout rotation (models/rope.py) is exactly

    out = x * C + roll(x, D/2, lanes) * S

and pltpu.roll is a cheap lane rotation. The op is linear in x, so the
backward pass is the same kernel with the sign-flipped table
    S_bwd = roll(S, D/2) = [sin | -sin].
I/O stays bf16 (the attention consumes bf16); the rotation itself is fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_L = 512


def _rope_kernel(x_ref, c_ref, s_ref, o_ref, *, half):
    x = x_ref[0].astype(jnp.float32)  # [BL, N, D]
    c = c_ref[:][:, None, :]          # [BL, 1, D]
    s = s_ref[:][:, None, :]
    rolled = pltpu.roll(x, half, 2)
    o_ref[0] = (x * c + rolled * s).astype(o_ref.dtype)


def pick_block_l(l: int) -> int:
    """Largest divisor of l that is <= BLOCK_L and a multiple of 8
    (sublane granularity); 0 if none exists (caller falls back to XLA)."""
    for bl in range(min(BLOCK_L, l), 7, -1):
        if l % bl == 0 and bl % 8 == 0:
            return bl
    return 0


def _rope_call(x, c_tab, s_tab):
    b, l, n, d = x.shape
    bl = pick_block_l(l)
    assert bl > 0 and d % 128 == 0, (l, d)
    grid = (b, l // bl)
    return pl.pallas_call(
        functools.partial(_rope_kernel, half=d // 2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bl, n, d), lambda b_, i: (b_, i, 0, 0)),
            pl.BlockSpec((bl, d), lambda b_, i: (i, 0)),
            pl.BlockSpec((bl, d), lambda b_, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bl, n, d), lambda b_, i: (b_, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, c_tab, s_tab)


@jax.custom_vjp
def rope_rotate(x, c_tab, s_tab):
    """x [B, L, N, D] (bf16/f32) -> rotated, same dtype. Tables [L, D]."""
    return _rope_call(x, c_tab, s_tab)


def _fwd(x, c_tab, s_tab):
    return _rope_call(x, c_tab, s_tab), (c_tab, s_tab)


def _bwd(res, g):
    c_tab, s_tab = res
    # linear op: dx = g * C + roll(g * S, half)... equivalently the same
    # kernel with S_bwd = roll(S, half) (= [sin | -sin])
    half = c_tab.shape[-1] // 2
    s_bwd = jnp.roll(s_tab, half, axis=-1)
    return _rope_call(g, c_tab, s_bwd), None, None


rope_rotate.defvjp(_fwd, _bwd)


def expand_tables(cos, sin):
    """[L, D/2] cos/sin -> ([L, D] C, [L, D] S) for the roll formulation."""
    c = jnp.concatenate([cos, cos], axis=-1)
    s = jnp.concatenate([-sin, sin], axis=-1)
    return c, s
