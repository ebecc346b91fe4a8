"""Int8 W8A8 serving path (ops/quant.py + WanConfig.quant_dense) — the
beyond-reference serving feature (the reference serves bf16 only;
README "Environment flags" + STATUS round-4 notes).

Pins: op-level error bound, load-time tree transform (quantize_params
against the quant model's eval_shape), tiny-model output drift vs the
bf16 model, and the sharded/jitted path on the 8-device mesh (int8
kernels take the same FSDP shardings as bf16 ones; scales replicate)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.ops import quant
from hyvideo_prfl_tpu.parallel import sharding as shd


def test_int8_dense_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 256), jnp.bfloat16)
    q, s = quant.quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (512,)
    assert int(jnp.max(jnp.abs(q))) <= 127
    y_ref = (x.astype(jnp.float32) @ w).astype(jnp.float32)
    y_q = quant.int8_dense(x, q, s, out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    # symmetric absmax W8A8 at D=256: ~1% relative error
    assert rel < 0.03, rel


def test_quantize_weight_stacked_layers():
    """nn.scan stacks kernels as [L, D, F]: scales must be per (layer,
    out-channel), reducing over the contraction axis only."""
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 32))
    q, s = quant.quantize_weight(w)
    assert q.shape == (3, 64, 32) and s.shape == (3, 32)
    for i in range(3):
        qi, si = quant.quantize_weight(w[i])
        np.testing.assert_array_equal(np.asarray(q[i]), np.asarray(qi))
        np.testing.assert_allclose(np.asarray(s[i]), np.asarray(si))


def test_zero_row_token_quantizes_to_zero():
    w = jnp.ones((16, 8)) * 0.1
    q, s = quant.quantize_weight(w)
    x = jnp.zeros((4, 16), jnp.bfloat16)
    y = quant.int8_dense(x, q, s)
    assert float(jnp.abs(y).max()) == 0.0


def _tiny_pair():
    cfg = wan_dit.tiny_test()
    cfg_q = wan_dit.tiny_test(quant_dense="int8")
    p = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    # the head is zero-init: randomize it so outputs are non-trivial
    h = p["params"]["head"]["head"]
    h["kernel"] = jax.random.normal(jax.random.PRNGKey(9),
                                    h["kernel"].shape) * 0.05
    qshapes = jax.eval_shape(
        lambda: wan_dit.init_params(cfg_q, jax.random.PRNGKey(0)))
    pq = quant.quantize_params(p, qshapes)
    return cfg, cfg_q, p, pq


def test_quantize_params_structure_and_model_drift():
    cfg, cfg_q, p, pq = _tiny_pair()
    blk = pq["params"]["blocks"]["self_attn"]["q"]
    assert set(blk) == {"kernel_q", "kernel_scale", "bias"}
    assert blk["kernel_q"].dtype == jnp.int8
    # stacked over the 2 scanned layers
    assert blk["kernel_q"].shape == (cfg.num_layers, cfg.dim, cfg.dim)
    assert blk["kernel_scale"].shape == (cfg.num_layers, cfg.dim)
    # non-quantized leaves pass through (fp32 islands stay fp32)
    assert pq["params"]["head"]["head"]["kernel"].dtype == jnp.float32

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 16)) * 0.5
    t = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.text_len, cfg.text_dim)) * 0.2
    o_ref = wan_dit.WanModel(cfg).apply(p, x, t, ctx)
    o_q = wan_dit.WanModel(cfg_q).apply(pq, x, t, ctx)
    assert bool(jnp.isfinite(o_q).all())
    rel = float(jnp.linalg.norm((o_q - o_ref).astype(jnp.float32))
                / jnp.linalg.norm(o_ref.astype(jnp.float32)))
    # residual stream dilutes the per-matmul ~1% error; measured ~0.3%
    assert rel < 0.02, rel


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_int8_sharded_serving_forward():
    """The quant tree takes FSDP shardings on the serving mesh (int8
    kernels shard like bf16 ones; [F] scales replicate below min_size)
    and the sharded jitted forward matches the single-device one."""
    cfg, cfg_q, p, pq = _tiny_pair()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 16)) * 0.5
    t = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.text_len, cfg.text_dim)) * 0.2
    o_single = wan_dit.WanModel(cfg_q).apply(pq, x, t, ctx)

    mesh = shd.make_mesh(data=2, sp=4)
    policy = shd.ShardingPolicy()
    model = wan_dit.WanModel(cfg_q, policy)
    with jax.set_mesh(mesh):
        psh = shd.fsdp_param_sharding(mesh, pq, min_size=1024)
        blk = psh["params"]["blocks"]["self_attn"]["q"]
        assert blk["kernel_q"].spec != jax.sharding.PartitionSpec()
        pq_s = jax.device_put(pq, psh)
        o_sharded = jax.jit(model.apply)(pq_s, x, t, ctx)
    np.testing.assert_allclose(
        np.asarray(o_sharded, dtype=np.float32),
        np.asarray(o_single, dtype=np.float32), atol=2e-2, rtol=2e-2)


# ---------------------------------------------------------------------------
# int8 qk^T serving attention (flash_attention(qk_int8=True) /
# WanConfig.quant_attn) — the attention-side sibling of quant_dense
# ---------------------------------------------------------------------------


def _qkv(L, heads=2, batch=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k, s: (jax.random.normal(k, (batch, L, heads, 128)) * s
                       ).astype(jnp.bfloat16)
    return mk(ks[0], 0.08), mk(ks[1], 0.08), mk(ks[2], 1.0)


def test_qk_int8_matches_bounded_and_routes(monkeypatch):
    """Multi-k-block int8 qk^T == the bf16 bounded kernel to quantization
    tolerance (incl. the ragged-lk padfree correction: zero-padded key
    columns quantize to exactly 0 -> p = 1, removed at finish), and the
    routing guards hold: dynamic k_valid and un-bounded callers never get
    the int8 kernel."""
    from hyvideo_prfl_tpu.ops import flash_attention as fa

    calls = []
    orig = fa._flash_fwd_qk8

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "_flash_fwd_qk8", spy)

    for L in (1024, 900):  # aligned and ragged (padfree through int8)
        q, k, v = _qkv(L)
        ref = fa.flash_attention(q, k, v, block_q=256, block_k=256,
                                 bounded_logits=True)
        out = fa.flash_attention(q, k, v, block_q=256, block_k=256,
                                 bounded_logits=True, qk_int8=True)
        d = np.abs(np.asarray(ref, np.float32) - np.asarray(out, np.float32))
        assert d.max() < 5e-3, (L, d.max())
    assert len(calls) == 2

    q, k, v = _qkv(1024)
    # dynamic k_valid keeps the shifted bf16 path
    fa.flash_attention(q, k, v, k_valid_len=jnp.array([800, 1024]),
                       block_q=256, block_k=256, bounded_logits=True,
                       qk_int8=True)
    # un-bounded callers keep bf16 (no tame-logit guarantee)
    fa.flash_attention(q, k, v, block_q=256, block_k=256, qk_int8=True)
    # single-k-block shapes keep bf16 (cross-attention path)
    fa.flash_attention(q, k, v, block_q=256, block_k=1024,
                       bounded_logits=True, qk_int8=True)
    assert len(calls) == 2


def test_quant_attn_model_drift(monkeypatch):
    """WanConfig.quant_attn='int8' routes every layer's self-attention
    through the int8 qk^T kernel (spied) with small end-to-end drift;
    cross-attention (single-k-block) stays bf16."""
    from hyvideo_prfl_tpu.ops import attention as attn_mod
    from hyvideo_prfl_tpu.ops import flash_attention as fa

    # shrink the full-K threshold so 1,024 self-attn tokens stream
    # multi-k-block (the int8 kernel's regime) even at test scale
    monkeypatch.setattr(fa, "FULL_K_MAX", 512)
    monkeypatch.setattr(fa, "DEFAULT_BLOCK_K", 256)
    calls = []
    orig = fa._flash_fwd_qk8

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "_flash_fwd_qk8", spy)

    cfg = wan_dit.tiny_test(remat=False)
    cfg_q = dataclasses.replace(cfg, quant_attn="int8")
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32, 32, 16)) * 0.5
    # grid (4, 16, 16) after the 2x2 patchify = 1,024 self-attn tokens:
    # with FULL_K_MAX shrunk above this streams multi-k-block (the int8
    # kernel regime); the default 256-token tiny shape stays single-block
    # full-K and legitimately keeps bf16
    t = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.text_len, cfg.text_dim)) * 0.2
    p = wan_dit.WanModel(cfg).init(jax.random.PRNGKey(0), x, t, ctx)
    # the head is zero-init: randomize it so the drift bound is
    # non-vacuous (otherwise o_ref == o_q == 0 and rel = 0/0 = NaN)
    h = p["params"]["head"]["head"]
    h["kernel"] = jax.random.normal(jax.random.PRNGKey(9),
                                    h["kernel"].shape) * 0.05

    attn_mod.set_default_backend("flash")
    try:
        o_ref = wan_dit.WanModel(cfg).apply(p, x, t, ctx)
        n_before = len(calls)
        o_q = wan_dit.WanModel(cfg_q).apply(p, x, t, ctx)
    finally:
        attn_mod.set_default_backend("auto")
    assert n_before == 0
    assert len(calls) == cfg.num_layers  # one int8 self-attn per layer
    rel = float(jnp.linalg.norm((o_q - o_ref).astype(jnp.float32))
                / jnp.linalg.norm(o_ref.astype(jnp.float32)))
    assert rel < 0.02, rel


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_quant_attn_usp_pure_ulysses_sharded(monkeypatch):
    """quant_attn under the pure-Ulysses USP serving mesh (ring=1, the
    uly-only topology the serving audit recommends): the shard_map path
    routes to the int8 kernel per device and matches the single-device
    int8 forward. dim 256 / 2 heads -> head_dim 128, the kernel's lane
    regime (the 14B model runs uly8 at 40 heads x 128)."""
    from hyvideo_prfl_tpu.ops import attention as attn_mod
    from hyvideo_prfl_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "FULL_K_MAX", 512)
    monkeypatch.setattr(fa, "DEFAULT_BLOCK_K", 256)
    calls = []
    orig = fa._flash_fwd_qk8

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "_flash_fwd_qk8", spy)

    cfg = wan_dit.tiny_test(remat=False, quant_attn="int8",
                            dim=256, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 32, 32, 16)) * 0.5
    # grid (4, 16, 16) after the 2x2 patchify = 1,024 self-attn tokens:
    # with FULL_K_MAX shrunk above this streams multi-k-block (the int8
    # kernel regime); the default 256-token tiny shape stays single-block
    # full-K and legitimately keeps bf16
    t = jnp.full((4,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (4, cfg.text_len, cfg.text_dim)) * 0.2
    p = wan_dit.WanModel(cfg).init(jax.random.PRNGKey(0), x, t, ctx)
    # randomize the zero-init head so the sharded-vs-single allclose
    # compares non-trivial outputs
    h = p["params"]["head"]["head"]
    h["kernel"] = jax.random.normal(jax.random.PRNGKey(9),
                                    h["kernel"].shape) * 0.05
    # "auto" routes to XLA off-TPU; force flash so the single-device
    # apply exercises the int8 kernel this test is about
    attn_mod.set_default_backend("flash")
    try:
        o_single = wan_dit.WanModel(cfg).apply(p, x, t, ctx)
    finally:
        attn_mod.set_default_backend("auto")
    n_single = len(calls)
    assert n_single == cfg.num_layers

    mesh = shd.make_usp_mesh(data=4, ring=1, ulysses=2)
    policy = shd.usp_policy()
    model = wan_dit.WanModel(cfg, policy)
    with jax.set_mesh(mesh):
        o_sharded = jax.jit(model.apply)(p, x, t, ctx)
    assert len(calls) > n_single  # the shard_map body traced the int8 path
    np.testing.assert_allclose(
        np.asarray(o_sharded, np.float32), np.asarray(o_single, np.float32),
        atol=2e-2, rtol=2e-2)


def test_int8_teacache_sampling_composes():
    """The two serving features compose: the int8 W8A8 pipeline under the
    TeaCache sampler at thresh=-1 (never skip) equals the plain int8
    sampler, and a permissive threshold still yields finite output with
    the skip path engaged (the residual-cache add runs on the int8
    model's bf16 stream outputs)."""
    from hyvideo_prfl_tpu.pipelines.pipeline import GenerateConfig, WanT2V

    cfg, cfg_q, p, pq = _tiny_pair()
    # remat-off tiny config for sampling speed, mirroring test_aux's
    # teacache test
    cfg_q = dataclasses.replace(cfg_q, remat=False)
    pipe = WanT2V(cfg_q, pq)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.text_len, cfg.text_dim)) * 0.1
    ctx_null = jnp.zeros_like(ctx)
    gen = GenerateConfig(sampling_steps=4, shift=3.0, sample_solver="unipc")
    rng = jax.random.PRNGKey(7)
    shape = (1, 2, 8, 8, 16)
    plain = pipe.sample(rng, shape, ctx, ctx_null, gen)
    tc = pipe.sample_teacache(rng, shape, ctx, ctx_null, gen,
                              thresh=-1.0, coeffs_key="t2v-1.3b")
    np.testing.assert_allclose(np.asarray(plain), np.asarray(tc), atol=1e-4)
    tc_skip = pipe.sample_teacache(rng, shape, ctx, ctx_null, gen,
                                   thresh=1e9, coeffs_key="t2v-1.3b")
    assert np.isfinite(np.asarray(tc_skip)).all()
    assert float(jnp.abs(tc_skip - tc).max()) > 0
