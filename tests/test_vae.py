"""Causal 3D VAE tests: shapes (stride 4,8,8), causality, roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyvideo_prfl_tpu.models import vae as vae_mod


@pytest.fixture(scope="module")
def full_vae():
    # the real Wan2.1 architecture SHAPE (dim_mult/temporal pattern/stride)
    # at reduced width — structure, causality and stride semantics are
    # width-independent, and CPU tests run ~5x faster
    cfg = vae_mod.VAEConfig(dim=32)
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(0), t=5, h=32, w=32)
    return cfg, params


def test_encode_shape_stride_488(full_vae):
    cfg, params = full_vae
    model = vae_mod.WanVAE(cfg)
    # T = 1+4k -> 1+k latent frames; H,W /8
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 32, 32, 3)) * 0.1
    z = model.apply(params, x, method=model.encode)
    assert z.shape == (1, 3, 4, 4, 16)
    assert np.isfinite(np.asarray(z)).all()


def test_decode_shape(full_vae):
    cfg, params = full_vae
    model = vae_mod.WanVAE(cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 4, 16)) * 0.1
    x = model.apply(params, z, method=model.decode)
    assert x.shape == (1, 9, 32, 32, 3)
    assert float(jnp.max(jnp.abs(x))) <= 1.0  # clamped
    assert np.isfinite(np.asarray(x)).all()


def test_single_frame_image_mode(full_vae):
    """T=1 (images) must work: 1 frame -> 1 latent frame -> 1 frame."""
    cfg, params = full_vae
    model = vae_mod.WanVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 32, 32, 3)) * 0.1
    z = model.apply(params, x, method=model.encode)
    assert z.shape == (1, 1, 4, 4, 16)
    x2 = model.apply(params, z, method=model.decode)
    assert x2.shape == (1, 1, 32, 32, 3)


def test_encoder_causality(full_vae):
    """Changing FUTURE frames must not change past latent frames."""
    cfg, params = full_vae
    model = vae_mod.WanVAE(cfg)
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 9, 32, 32, 3)) * 0.1
    z1 = model.apply(params, x, method=model.encode)
    x2 = x.at[:, 5:].set(jax.random.normal(jax.random.PRNGKey(5), (1, 4, 32, 32, 3)))
    z2 = model.apply(params, x2, method=model.encode)
    # latent frame 0 covers input frame 0 only; frame 1 covers frames 1-4
    np.testing.assert_allclose(
        np.asarray(z1[:, 0]), np.asarray(z2[:, 0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(z1[:, 1]), np.asarray(z2[:, 1]), atol=1e-5
    )


def test_vae_grad_flows(full_vae):
    """Differentiable decode: PRFL sanity decode + future RGB-reward parity."""
    cfg, params = full_vae
    model = vae_mod.WanVAE(cfg)
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 4, 4, 16)) * 0.1

    def f(z):
        return jnp.mean(model.apply(params, z, method=model.decode) ** 2)

    g = jax.grad(f)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_tiny_roundtrip_trains():
    """A tiny VAE can be optimized end-to-end (reconstruction improves)."""
    import optax
    cfg = vae_mod.tiny_vae()
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(0), t=5, h=16, w=16)
    model = vae_mod.WanVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16, 16, 3)) * 0.3
    tx = optax.adam(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return jnp.mean((model.apply(p, x) - x) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for _ in range(15):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_vae_spatial_shard_matches_single_device(devices8):
    """GSPMD W-sharded VAE decode == single-device (context parallelism,
    replacing the reference's halo-exchange plugins)."""
    import dataclasses
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.parallel import sharding as shd

    cfg = vae_mod.tiny_vae()
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(0), t=5, h=16, w=16)
    model = vae_mod.WanVAE(cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 16, 4)) * 0.3
    ref = model.apply(params, z, method=model.decode)

    cfg_s = dataclasses.replace(cfg, spatial_shard=True)
    model_s = vae_mod.WanVAE(cfg_s)
    mesh = shd.make_mesh(data=1, sp=8)
    with jax.set_mesh(mesh):
        z_s = jax.device_put(z, NamedSharding(mesh, P(None, None, None, "sp")))
        out = jax.jit(lambda p, z: model_s.apply(p, z, method=model_s.decode)
                      )(params, z_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_streaming_decode_matches_whole_clip(full_vae):
    """decode_streaming (per-conv cache, chunked frames) == whole-clip
    decode — the reference's feat_cache path (vae.py:545-569) as explicit
    scan state. Covers frame-0 bypass, the zeroed 'Rep' stream, and both
    temporal upsample stages."""
    cfg, params = full_vae
    model = vae_mod.WanVAE(cfg)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 5, 4, 4, 16)) * 0.3
    ref = model.apply(params, z, method=model.decode)
    for chunk in (1, 2):
        out = vae_mod.decode_streaming(params, cfg, z,
                                       frames_per_chunk=chunk)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_streaming_decode_host_stream_and_bf16(full_vae):
    """host_stream=True returns the identical pixels as the on-device
    concat (numpy, chunk-fetched — the single-chip big-clip path), and the
    bf16 stream option stays close to the fp32 decode (fp32 norm islands;
    the single-chip 720p x 81f fallback — scripts/decode_latents.py picks
    it automatically above the fp32 HBM budget)."""
    cfg, params = full_vae
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 5, 4, 4, 16)) * 0.3
    ref = vae_mod.decode_streaming(params, cfg, z, frames_per_chunk=2)
    host = vae_mod.decode_streaming(params, cfg, z, frames_per_chunk=2,
                                    host_stream=True)
    assert isinstance(host, np.ndarray)
    np.testing.assert_array_equal(host, np.asarray(ref))

    bf16 = vae_mod.decode_streaming(params, cfg, z, frames_per_chunk=2,
                                    dtype=jnp.bfloat16, host_stream=True)
    assert bf16.dtype == np.float32  # output is clipped fp32 either way
    err = np.abs(bf16 - np.asarray(ref)).max()
    assert err < 0.05, f"bf16 stream drifted {err} from fp32"


def test_streaming_encode_matches_whole_clip(full_vae):
    """encode_streaming (1 + 4k pixel-frame chunks, per-conv cache) ==
    whole-clip encode — the reference's chunked encode (vae.py:517-543)."""
    cfg, params = full_vae
    model = vae_mod.WanVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 9, 32, 32, 3)) * 0.5
    ref = model.apply(params, x, method=model.encode)
    out = vae_mod.encode_streaming(params, cfg, x, frames_per_chunk=4)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_latents_cli(tmp_path):
    """scripts/decode_latents.py: latents npy + orbax VAE -> mp4 on disk
    (the standalone decode tool / inference OOM-fallback path)."""
    import subprocess
    import sys as _sys

    cfg = vae_mod.tiny_vae()
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(0))
    # the CLI infers the VAEConfig from the checkpoint tree
    # (vae.infer_config) — no config side-channel, so the tiny VAE is
    # loadable as-is; also pin that the inference reconstructs this config
    assert vae_mod.infer_config(params) == cfg
    from hyvideo_prfl_tpu.utils import checkpoint as ck
    ck.save_orbax(str(tmp_path / "vae"), params)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 4, 4)))
    np.save(tmp_path / "lat.npy", z)

    import scripts.decode_latents as dl
    argv = _sys.argv
    _sys.argv = ["decode_latents.py", "--latents", str(tmp_path / "lat.npy"),
                 "--vae_params", str(tmp_path / "vae"),
                 "--save_file", str(tmp_path / "out.mp4"),
                 "--decode_chunk", "1"]
    try:
        rc = dl.main()
    finally:
        _sys.argv = argv
    assert rc == 0
    assert (tmp_path / "out.mp4").stat().st_size > 0
