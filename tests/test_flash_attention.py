"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyvideo_prfl_tpu.ops import attention as attn_mod
from hyvideo_prfl_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    yield


def _rand_qkv(key, b=1, l=256, n=2, d=128, lk=None, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    lk = lk or l
    q = jax.random.normal(ks[0], (b, l, n, d), dtype)
    k = jax.random.normal(ks[1], (b, lk, n, d), dtype)
    v = jax.random.normal(ks[2], (b, lk, n, d), dtype)
    return q, k, v


def test_forward_matches_xla():
    q, k, v = _rand_qkv(0)
    out_flash = fa.flash_attention(q, k, v)
    out_xla = attn_mod._xla_attention(q, k, v, None)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=2e-5
    )


def test_forward_unpadded_vs_padded_seq():
    """Lq=200 (not a block multiple) must pad internally and still match."""
    q, k, v = _rand_qkv(1, l=200)
    out_flash = fa.flash_attention(q, k, v)
    out_xla = attn_mod._xla_attention(q, k, v, None)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=2e-5
    )


def test_k_valid_len_masking():
    q, k, v = _rand_qkv(2, b=2, l=128, lk=256)
    valid = jnp.asarray([100, 256], jnp.int32)
    out_flash = fa.flash_attention(q, k, v, k_valid_len=valid)
    out_xla = attn_mod._xla_attention(q, k, v, valid)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=2e-5
    )


def test_backward_matches_xla():
    q, k, v = _rand_qkv(3, l=256)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attn_mod._xla_attention(q, k, v, None) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_backward_with_masking():
    q, k, v = _rand_qkv(4, b=2, l=128, lk=256)
    valid = jnp.asarray([100, 192], jnp.int32)

    gf = jax.grad(lambda q, k, v: jnp.sum(
        fa.flash_attention(q, k, v, k_valid_len=valid) ** 2
    ), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(
        attn_mod._xla_attention(q, k, v, valid) ** 2
    ), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )
    # grads w.r.t. masked-out keys must be exactly zero
    np.testing.assert_array_equal(np.asarray(gf[1][0, 100:]), 0.0)
    np.testing.assert_array_equal(np.asarray(gf[2][0, 100:]), 0.0)


def test_bf16_forward():
    q, k, v = _rand_qkv(5, l=256, dtype=jnp.bfloat16)
    out_flash = fa.flash_attention(q, k, v)
    out_xla = attn_mod._xla_attention(q, k, v, None)
    assert out_flash.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_flash, np.float32), np.asarray(out_xla, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_block_selection_heuristics():
    """Measured geometry choices stay pinned (profile_flash_ab/75k):
    streaming block_k minimizes k padding between 2048 and 1920; the
    backward caps at 512x2048; full-K engages for short keys."""
    from hyvideo_prfl_tpu.ops.flash_attention import (
        _bwd_blocks, _pad_len, pick_blocks,
    )

    # 18,900 tokens: 1920 pads 1.6% vs 8.4% at 2048 -> pick 1920
    bq, bk = pick_blocks(18900, 18900)
    assert (bq, bk) == (512, 1920)
    # 75,600 tokens: 2048 pads 0.23% vs 1.6% -> pick 2048
    bq, bk = pick_blocks(75600, 75600)
    assert (bq, bk) == (512, 2048)
    # short keys: single full-K block (cross attention)
    bq, bk = pick_blocks(18900, 512)
    assert bk == 512
    # backward keeps blocks <= 512 x 2048 and divisors of padded lengths
    for lq, lk in ((18900, 18900), (75600, 75600)):
        fbq, fbk = pick_blocks(lq, lk)
        lq_p, lk_p = _pad_len(lq, fbq), _pad_len(lk, fbk)
        bbq, bbk = _bwd_blocks(lq_p, lk_p, fbq, fbk)
        assert bbq <= 512 and bbk <= 2048
        assert lq_p % bbq == 0 and lk_p % bbk == 0


def test_cross_routing_thresholds():
    """auto backend: flash for long self-attn (lk>=1024) and long-q cross
    (lq>=3072); XLA for short everything (reward heads, CPU tests)."""
    from unittest import mock

    from hyvideo_prfl_tpu.ops import attention as att

    with mock.patch(
            "hyvideo_prfl_tpu.ops.flash_attention._interpret",
            return_value=False):
        assert att._resolve_auto(128, 18900, 18900) == "flash"  # self
        assert att._resolve_auto(128, 512, 18900) == "flash"    # cross 720p
        assert att._resolve_auto(128, 512, 3120) == "flash"     # cross bench
        assert att._resolve_auto(128, 512, 256) == "xla"        # short q
        assert att._resolve_auto(64, 512, 18900) == "xla"       # d%128 != 0
    with mock.patch(
            "hyvideo_prfl_tpu.ops.flash_attention._interpret",
            return_value=True):
        assert att._resolve_auto(128, 18900, 18900) == "xla"    # not on TPU


def test_merged_backward_matches_split():
    """FLASH_MERGED_BWD single-pass kernel == split dq/dkv kernels across
    mask modes (scripts/profile_flash_merged.py measured it bit-exact on
    hardware; CPU interpret allows block-geometry reduction-order noise)."""
    for lq, lk, kvl in ((2048, 2048, None), (3120, 3120, None),
                        (2100, 2100, jnp.asarray([2000, 1800], jnp.int32)),
                        (4096, 512, None)):
        q, k, v = _rand_qkv(11, b=2, l=lq, lk=lk)

        def grads(merged):
            old = fa.FLASH_MERGED_BWD
            fa.FLASH_MERGED_BWD = merged
            try:
                f = lambda q, k, v: jnp.sum(
                    fa.flash_attention(q, k, v, k_valid_len=kvl) ** 2)
                return jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            finally:
                fa.FLASH_MERGED_BWD = old

        for a, b, name in zip(grads(True), grads(False), "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"d{name} mismatch at lq={lq} lk={lk}",
            )


def test_merged_backward_dispatch():
    """The merged path engages only with >= 4 q blocks (HBM accumulation
    needs the write-back of block i to land before its re-fetch under
    double buffering) and its block_k cap stays a padded-length divisor."""
    from hyvideo_prfl_tpu.ops.flash_attention import _bwd_blocks_merged

    for lq_p, lk_p, want_bk in ((19200, 19200, 1280), (75776, 75776, 1024),
                                (3200, 3200, 640)):
        bq, bk = _bwd_blocks_merged(lq_p, lk_p)
        assert lq_p % bq == 0 and lk_p % bk == 0
        assert bk == want_bk, (lk_p, bk)


def test_bounded_forward_matches_shifted():
    """FLASH_BOUNDED fixed-max forward == shifted online-softmax across
    the streaming (multi-k-block), streaming+padfree, and single-block
    paths — outputs, natural-units lse, and gradients (the backward is
    shared; grads differ only through lse rounding)."""
    for lq in (4096, 4000, 512):
        q, k, v = _rand_qkv(13, n=1, l=lq)

        def run(bounded):
            out = fa.flash_attention(q, k, v, bounded_logits=bounded)
            g = jax.grad(lambda q: jnp.sum(fa.flash_attention(
                q, k, v, bounded_logits=bounded) ** 2))(q)
            # lse at the kernel boundary (ring merges consume it)
            blocks = fa.pick_blocks(lq, lq)
            lp = fa._pad_len(lq, blocks[0])
            qb = jnp.moveaxis(q, 2, 1).reshape(1, lq, 128)
            qb = jnp.pad(qb, ((0, 0), (0, lp - lq), (0, 0)))
            kp = fa._pad_len(lq, blocks[1])
            kb = jnp.pad(jnp.moveaxis(k, 2, 1).reshape(1, lq, 128),
                         ((0, 0), (0, kp - lq), (0, 0)))
            vb = jnp.pad(jnp.moveaxis(v, 2, 1).reshape(1, lq, 128),
                         ((0, 0), (0, kp - lq), (0, 0)))
            mode = "padfree" if kp != lq else None
            if bounded:
                mode = fa._encode_bounded(mode)
            _, lse = fa._flash_fwd_impl(
                qb, kb, vb, jnp.full((1,), lq, jnp.int32), *blocks,
                mode, lq)
            return out, g, lse[:, :lq, 0]

        ob, gb, lse_b = run(True)
        os_, gs, lse_s = run(False)
        np.testing.assert_allclose(np.asarray(ob), np.asarray(os_),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"out mismatch at lq={lq}")
        np.testing.assert_allclose(np.asarray(lse_b), np.asarray(lse_s),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"lse mismatch at lq={lq}")
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gs),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"grad mismatch at lq={lq}")


def test_attn_logit_bound():
    """attn_logit_bound -> (typical, worst) over all norm_q/norm_k/
    norm_k_img leaves: typical = gq*gk*sqrt(hd) (per-head energy spread),
    worst = gq*gk*D/sqrt(hd) (all energy in one aligned head) — the
    FLASH_BOUNDED contract figures; (0, 0) when no norms found."""
    params = {"params": {"blocks": {
        "self_attn": {"norm_q": jnp.full((64,), 2.0),
                      "norm_k": jnp.full((64,), 0.5)},
        "cross_attn": {"norm_q": jnp.ones((64,)),
                       "norm_k_img": jnp.full((64,), -3.0)},
    }}}
    typical, worst = fa.attn_logit_bound(params, head_dim=16)
    assert abs(typical - 2.0 * 3.0 * 4.0) < 1e-6
    assert abs(worst - 2.0 * 3.0 * 64.0 / 4.0) < 1e-6
    assert fa.attn_logit_bound({"params": {}}, head_dim=16) == (0.0, 0.0)


def test_wan_dit_opts_into_bounded_flash(monkeypatch):
    """The qk-normed DiT attention paths request the fixed-max forward
    (bounded_logits=True); naive flash_attention callers default to the
    overflow-safe shifted softmax."""
    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.ops import attention as attn_mod

    seen = []
    orig = fa.flash_attention

    def spy(q, k, v, **kw):
        seen.append(bool(kw.get("bounded_logits", False)))
        return orig(q, k, v, **kw)

    # force the flash backend and the single-chip path so the spy sees
    # the dispatch kwargs (multichip routes to flash_attention_sharded)
    monkeypatch.setattr(attn_mod, "_resolve_auto",
                        lambda *a, **k: "flash")
    monkeypatch.setattr(attn_mod, "multichip_context", lambda: False)
    import hyvideo_prfl_tpu.ops.flash_attention as fa_mod
    monkeypatch.setattr(fa_mod, "flash_attention", spy)

    cfg = wan_dit.WanConfig(model_type="t2v", dim=128, ffn_dim=256,
                            num_heads=1, num_layers=1, remat=False)
    blk = wan_dit.WanBlock(cfg)
    import jax.numpy as jnp2
    from hyvideo_prfl_tpu.models.rope import rope_tables_rolled
    cos, sin = rope_tables_rolled((2, 4, 4), cfg.head_dim)
    x = jnp2.ones((1, 32, 128), jnp2.float32) * 0.1
    ctx = jnp2.ones((1, 16, 128), jnp2.bfloat16) * 0.1
    e6 = jnp2.ones((1, 6, 128), jnp2.float32) * 0.1
    params = blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos, sin)
    blk.apply(params, x, e6, ctx, cos, sin)
    assert seen and all(seen), seen  # self + cross both opted in
