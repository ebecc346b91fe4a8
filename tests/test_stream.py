"""Fused LayerNorm+scale/shift kernel (ops/stream.py): fwd/bwd parity vs
the unfused wan_dit._layer_norm chain, the ragged (non-multiple-of-8) block
path, dispatch fallbacks, and the GSPMD-partitioned multi-device path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.ops import stream

D = 256


@pytest.fixture(autouse=True)
def _force_kernel_path(monkeypatch):
    # the dispatcher skips interpret-mode pallas on CPU (too slow for the
    # model-level tests); force the real kernel path here
    monkeypatch.setenv("PALLAS_INTERPRET", "1")


def _mk(b=1, l=48, d=D, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, l, d) * 0.5, jnp.float32)
    s = jnp.asarray(1.0 + 0.1 * rng.randn(b, d), jnp.float32)
    t = jnp.asarray(0.1 * rng.randn(b, d), jnp.float32)
    return x, s, t


def _unfused(x, s, t, out_dtype=jnp.bfloat16, eps=1e-6):
    """The original block chain: fp32 LN then modulate then cast."""
    h = wan_dit._layer_norm(x, eps) * s[:, None, :] + t[:, None, :]
    return h.astype(out_dtype)


def test_fwd_matches_unfused_exactly():
    x, s, t = _mk()
    got = stream.ln_scale_shift(x, s, t)
    want = _unfused(x, s, t)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_fwd_fp32_out():
    x, s, t = _mk(b=2)
    got = stream.ln_scale_shift(x, s, t, out_dtype=jnp.float32)
    want = _unfused(x, s, t, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_affine_broadcast_shapes():
    # norm3 flavor: per-feature scale/bias [D] broadcast over batch
    x, _, _ = _mk(b=2)
    rng = np.random.RandomState(3)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(D), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    got = stream.ln_scale_shift(x, scale, bias)
    want = wan_dit._layer_norm(x, 1e-6, scale, bias).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_ragged_block_path():
    # l = 36 has no multiple-of-8 divisor: the picker takes the largest
    # fitting multiple of 8 (bl = 32) and the cdiv grid's trailing block
    # covers the ragged 4 rows; output must still match exactly
    x, s, t = _mk(l=36)
    assert stream.pick_block_l(36, D) == 32
    got = stream.ln_scale_shift(x, s, t)
    want = _unfused(x, s, t)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_ragged_block_backward():
    # the trailing block's garbage rows must not leak into ds/dt (the
    # cross-row partial sums mask them explicitly in the bwd kernel)
    x, s, t = _mk(l=36)

    def f_fused(x, s, t):
        return jnp.sum(jnp.sin(
            stream.ln_scale_shift(x, s, t, out_dtype=jnp.float32)))

    def f_ref(x, s, t):
        return jnp.sum(jnp.sin(_unfused(x, s, t, out_dtype=jnp.float32)))

    got = jax.grad(f_fused, argnums=(0, 1, 2))(x, s, t)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(x, s, t)
    for g, w in zip(got, want):
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4, rtol=1e-4)


def test_bwd_matches_unfused():
    x, s, t = _mk(b=2, l=64)

    def f_fused(x, s, t):
        return jnp.sum(jnp.sin(
            stream.ln_scale_shift(x, s, t, out_dtype=jnp.float32)))

    def f_ref(x, s, t):
        return jnp.sum(jnp.sin(_unfused(x, s, t, out_dtype=jnp.float32)))

    got = jax.grad(f_fused, argnums=(0, 1, 2))(x, s, t)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(x, s, t)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4, rtol=1e-4)


def test_bwd_through_block_modulation():
    # adaLN flavor: s/t derive from the time embedding; grads must flow
    # back to e (the reference's modulation input, model.py:339-341)
    x, _, _ = _mk(b=2, l=64)
    rng = np.random.RandomState(5)
    e = jnp.asarray(0.1 * rng.randn(2, 6, D), jnp.float32)

    def f_fused(x, e):
        h = stream.ln_scale_shift(x, 1.0 + e[:, 1], e[:, 0],
                                  out_dtype=jnp.float32)
        return jnp.sum(jnp.cos(h))

    def f_ref(x, e):
        h = (wan_dit._layer_norm(x, 1e-6) * (1.0 + e[:, 1][:, None, :])
             + e[:, 0][:, None, :])
        return jnp.sum(jnp.cos(h))

    gx, ge = jax.grad(f_fused, argnums=(0, 1))(x, e)
    rx, re = jax.grad(f_ref, argnums=(0, 1))(x, e)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(re),
                               atol=1e-4, rtol=1e-4)


def test_dispatch_fallbacks(monkeypatch):
    x, s, t = _mk(l=4)  # below one sublane tile -> pick 0 -> XLA ref
    assert stream.pick_block_l(4, D) == 0
    got = stream.ln_scale_shift(x, s, t)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(_unfused(x, s, t), np.float32))
    # kill switch
    monkeypatch.setenv("HYV_FUSED_LN", "0")
    x, s, t = _mk()
    got = stream.ln_scale_shift(x, s, t)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(_unfused(x, s, t), np.float32))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_sharded_matches_and_partitions():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x, s, t = _mk(b=2, l=64, seed=1)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "sp"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "sp", None)))

    def f(x, s, t):
        return stream.ln_scale_shift(x, s, t, out_dtype=jnp.float32)

    with jax.set_mesh(mesh):
        fj = jax.jit(f, in_shardings=(
            NamedSharding(mesh, P("data", "sp", None)), None, None))
        got = fj(xs, s, t)
        txt = fj.lower(xs, s, t).compile().as_text()
    want = stream._xla_ref(x, s, t, 1e-6, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # must execute on PER-SHARD shapes (b=2,l=64 over the 2x4 mesh ->
    # local [1,16,256]): no sequence all-gather around the op
    assert "f32[1,16,256]" in txt

    # gradient under the mesh (XLA bwd path) stays correct
    def loss(x, s, t):
        return jnp.sum(jnp.sin(f(x, s, t)))

    with jax.set_mesh(mesh):
        gx, gs, gt = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xs, s, t)
    rx, rs, rt = jax.grad(
        lambda x_, s_, t_: jnp.sum(jnp.sin(
            stream._xla_ref(x_, s_, t_, 1e-6, jnp.float32))),
        argnums=(0, 1, 2))(x, s, t)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt),
                               atol=1e-4, rtol=1e-4)
