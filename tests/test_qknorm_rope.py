"""Fused qk-RMSNorm+rope kernel: fwd/bwd parity vs the unfused chain,
dispatch fallbacks, and the GSPMD-partitioned multi-device path.

API contract (ops/qknorm_rope.py): x [B, L, dim] -> [B, N, L, D]."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.models.rope import (
    apply_rope_rolled, rope_tables_rolled,
)
from hyvideo_prfl_tpu.ops import qknorm_rope as qr

N, D = 2, 128


@pytest.fixture(autouse=True)
def _force_kernel_path(monkeypatch):
    # the dispatcher skips interpret-mode pallas on CPU (too slow for the
    # model-level tests); force the real kernel path here, restored per test
    monkeypatch.setenv("PALLAS_INTERPRET", "1")


def _unfused(x, w, cos, sin, eps=1e-6):
    """The original model chain: _rms_norm on [B,L,dim], reshape, rope,
    then head-major moveaxis."""
    b, l, m = x.shape
    y = wan_dit._rms_norm(x, w, eps).reshape(b, l, N, D)
    return jnp.moveaxis(apply_rope_rolled(y, cos, sin), 2, 1)


def _mk(b=1, l=48, grid=(3, 4, 4), dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, l, N * D), dtype)
    w = jnp.asarray(rng.rand(N * D) + 0.5, jnp.float32)
    cos, sin = rope_tables_rolled(grid, D)
    return x, w, cos, sin


def test_fwd_matches_unfused():
    x, w, cos, sin = _mk()
    got = qr.rmsnorm_rope(x, w, cos, sin, N)
    want = _unfused(x, w, cos, sin)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_fwd_local_kernel_matches_xla_ref_exactly():
    """The Pallas kernel (interpret on CPU) matches the unfused _xla_ref
    bitwise-comparably at fp32."""
    x, w, cos, sin = _mk(dtype=jnp.float32)
    got = qr._local(x, w.reshape(N, D), cos, sin, 1e-6, True)
    want = qr._xla_ref(x, w.reshape(N, D), cos, sin, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_ragged_divisor_block():
    """l = 36 has no multiple-of-8 divisor: the picker takes bl=32 under a
    cdiv grid and the trailing block's 4 valid rows are write-masked (fwd/
    dx) and partial-masked (dw) — the 14B Ulysses shard 18,900 hits the
    same path with bl=152. Fwd and bwd must both match."""
    assert qr.pick_block_l(36, N, D) == 32
    x, w, cos, sin = _mk(l=36, grid=(3, 4, 3), dtype=jnp.float32)
    got = qr._local(x, w.reshape(N, D), cos, sin, 1e-6, True)
    want = qr._xla_ref(x, w.reshape(N, D), cos, sin, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)

    def f_fused(x, w):
        return jnp.sum(jnp.sin(qr.rmsnorm_rope(x, w, cos, sin, N)))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(_unfused(x, w, cos, sin)))

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw).ravel(), np.asarray(rw).ravel(),
                               atol=1e-4, rtol=1e-4)


def test_bwd_matches_unfused():
    x, w, cos, sin = _mk(dtype=jnp.float32)

    def f_fused(x, w):
        return jnp.sum(jnp.sin(qr.rmsnorm_rope(x, w, cos, sin, N)))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(_unfused(x, w, cos, sin)))

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw).ravel(),
                               np.asarray(rw).ravel(),
                               atol=1e-4, rtol=1e-4)


def test_rmsnorm_only_matches():
    x, w, _, _ = _mk(dtype=jnp.float32)
    got = qr.rmsnorm_only(x, w, N)
    b, l, m = x.shape
    want = jnp.moveaxis(
        wan_dit._rms_norm(x, w, 1e-6).reshape(b, l, N, D), 2, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_odd_head_dim_falls_back():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 48, 2 * 64), jnp.bfloat16)
    w = jnp.asarray(rng.rand(2 * 64) + 0.5, jnp.float32)
    cos, sin = rope_tables_rolled((3, 4, 4), 64)
    got = qr.rmsnorm_rope(x, w, cos, sin, 2)  # d % 128 != 0 -> _xla_ref
    b, l, m = x.shape
    y = wan_dit._rms_norm(x, w, 1e-6).reshape(b, l, 2, 64)
    want = jnp.moveaxis(apply_rope_rolled(y, cos, sin), 2, 1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_sharded_matches_and_partitions():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x, w, cos, sin = _mk(b=2, l=64, grid=(4, 4, 4), dtype=jnp.float32,
                         seed=1)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "sp"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "sp", None)))

    def f(x, w):
        return qr.rmsnorm_rope(x, w, cos, sin, N)

    with jax.set_mesh(mesh):
        fj = jax.jit(f, in_shardings=(
            NamedSharding(mesh, P("data", "sp", None)), None))
        got = fj(xs, w)
        txt = fj.lower(xs, w).compile().as_text()
    want = qr._xla_ref(x, w.reshape(N, D), cos, sin, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # the op must execute on PER-SHARD shapes (b=2,l=64 over the 2x4 mesh
    # -> x local [1,16,256], out local [1,2,16,128]), i.e. no sequence
    # all-gather around it. On TPU the kernel additionally appears as a
    # tpu_custom_call; on CPU interpret-mode pallas lowers to plain XLA.
    assert "f32[1,2,16,128]" in txt

    # gradient under the mesh (XLA bwd path) stays correct
    def loss(x, w):
        return jnp.sum(jnp.sin(f(x, w)))

    with jax.set_mesh(mesh):
        gx, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, w)
    rx, rw = jax.grad(
        lambda x_, w_: jnp.sum(jnp.sin(_unfused(x_, w_, cos, sin))),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw).ravel(),
                               np.asarray(rw).ravel(),
                               atol=1e-4, rtol=1e-4)
