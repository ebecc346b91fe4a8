"""3D rotary position embeddings for video DiT, TPU-native.

Parity target: reference `wan/modules/model.py:36-103` (rope_params /
rope_apply). The reference builds complex float64 frequency tables and
multiplies per-sample in a python loop; TPUs have no float64 and XLA wants
static shapes, so here we precompute real cos/sin tables for the (F, H, W)
token grid once per shape (host-side float64 numpy -> fp32 device constant)
and apply the rotation as two fused elementwise ops.

Head-dim split (model.py:521-526 with d = head_dim): bands of half-dim c=d/2
are (c - 2*(c//3), c//3, c//3) for (t, h, w). Pairing is adjacent (even, odd)
lanes, matching torch.view_as_complex on a [..., c, 2] reshape.

Sequence parallelism: under a ("data","sp") mesh with tokens sharded on sp,
the caller slices the table to the local shard (reference rank-offset logic
model.py:89-96); with GSPMD sharding constraints XLA partitions the table
automatically, so no explicit slicing is needed.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def rope_tables(grid: tuple, head_dim: int, theta: float = 10000.0):
    """cos/sin tables for an (F, H, W) grid, shape [L, head_dim//2] each.

    Row-major token order (w fastest), matching patchified flattening.
    Cached host-side as numpy (caching device arrays would leak tracers
    when first touched inside a jit trace); jnp.asarray of a cached numpy
    array is a plain constant in any trace.
    """
    cos_np, sin_np = _rope_tables_np(grid, head_dim, theta)
    return jnp.asarray(cos_np), jnp.asarray(sin_np)


@functools.lru_cache(maxsize=32)
def _rope_tables_np(grid: tuple, head_dim: int, theta: float = 10000.0):
    f, h, w = grid
    c = head_dim // 2
    ct = c - 2 * (c // 3)
    ch = c // 3
    cw = c // 3

    def freqs(n_pos, dim):
        inv = 1.0 / np.power(theta, np.arange(0, dim, dtype=np.float64) / dim)
        return np.outer(np.arange(n_pos, dtype=np.float64), inv)  # [n, dim]

    ang_t = freqs(f, ct)  # [f, ct]
    ang_h = freqs(h, ch)
    ang_w = freqs(w, cw)

    # broadcast to the full grid then concat along the freq axis
    ang = np.concatenate(
        [
            np.broadcast_to(ang_t[:, None, None, :], (f, h, w, ct)),
            np.broadcast_to(ang_h[None, :, None, :], (f, h, w, ch)),
            np.broadcast_to(ang_w[None, None, :, :], (f, h, w, cw)),
        ],
        axis=-1,
    ).reshape(f * h * w, c)
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate frequency pairs of x by the table angles — HALF layout.

    x: [B, L, N, D]; cos/sin: [L, D//2]. Rotation in fp32; returns fp32
    (reference rope_apply returns float, model.py:103).

    Layout note: the reference pairs ADJACENT lanes (torch.view_as_complex
    on [..., c, 2], model.py:73-77). We pair (x[..., i], x[..., D/2+i])
    instead — contiguous halves vectorize on the VPU (measured ~10x faster
    than the strided even/odd pattern, which XLA lowers to per-pair
    gathers). Checkpoint conversion permutes the q/k projection columns
    (+ their RMS-norm scales) between conventions, which leaves attention
    outputs bit-identical: softmax(q k^T) is invariant to any permutation
    applied to BOTH q and k head dims (utils/checkpoint.py rope_permute).
    """
    b, l, n, d = x.shape
    h = d // 2
    xf = x.astype(jnp.float32)
    x1 = xf[..., :h]
    x2 = xf[..., h:]
    cos_b = cos[None, :, None, :]
    sin_b = sin[None, :, None, :]
    out1 = x1 * cos_b - x2 * sin_b
    out2 = x1 * sin_b + x2 * cos_b
    return jnp.concatenate([out1, out2], axis=-1)


def rope_permutation(head_dim: int) -> np.ndarray:
    """Index map: reference adjacent-pair slot -> our half-layout slot.

    perm[new_position] = old_position. Column j of a reference q/k kernel
    moves to position perm^-1... concretely: our x[..., i] must equal
    reference x[..., 2i] and our x[..., h+i] == reference x[..., 2i+1],
    so gather old indices [0, 2, 4, ..., 1, 3, 5, ...].
    """
    h = head_dim // 2
    return np.concatenate([np.arange(0, head_dim, 2),
                           np.arange(1, head_dim, 2)])


@functools.lru_cache(maxsize=32)
def _rolled_tables_np(grid: tuple, head_dim: int, theta: float = 10000.0):
    cos, sin = _rope_tables_np(grid, head_dim, theta)
    c = np.concatenate([cos, cos], axis=-1)
    s = np.concatenate([-sin, sin], axis=-1)
    return c, s


def rope_tables_rolled(grid: tuple, head_dim: int, theta: float = 10000.0):
    """Expanded [L, D] tables for the roll formulation
    (ops/rope_pallas.py): C = [cos|cos], S = [-sin|sin]."""
    c, s = _rolled_tables_np(grid, head_dim, theta)
    return jnp.asarray(c), jnp.asarray(s)


def apply_rope_rolled(x: jnp.ndarray, c_tab: jnp.ndarray,
                      s_tab: jnp.ndarray) -> jnp.ndarray:
    """Half-layout rotation via out = x*C + roll(x, D/2)*S.

    Uses the XLA concat formulation (measured faster than both the strided
    pairwise math and the current standalone Pallas kernel, whose
    [bl, n_heads, d] block suffers sublane relayouts when n_heads % 8 != 0
    — see ops/rope_pallas.py; that kernel is bit-exact and kept as the
    basis for a round-2 fused qk-norm+rope kernel, the real win since the
    norm chain runs at ~93 GB/s under XLA). Preserves x.dtype."""
    d = x.shape[-1]
    half = d // 2
    xf = x.astype(jnp.float32)
    rolled = jnp.concatenate([xf[..., half:], xf[..., :half]], axis=-1)
    out = xf * c_tab[None, :, None, :] + rolled * s_tab[None, :, None, :]
    return out.astype(x.dtype)
