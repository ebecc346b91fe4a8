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
    """Rotate adjacent (even, odd) lane pairs of x by the table angles.

    x: [B, L, N, D] (any dtype; rotation in fp32, returns fp32 like the
    reference's rope_apply output, model.py:103).
    cos/sin: [L, D//2].
    """
    b, l, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, l, n, d // 2, 2)
    x_even = xf[..., 0]
    x_odd = xf[..., 1]
    cos_b = cos[None, :, None, :]
    sin_b = sin[None, :, None, :]
    out_even = x_even * cos_b - x_odd * sin_b
    out_odd = x_even * sin_b + x_odd * cos_b
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(b, l, n, d)
    return out
