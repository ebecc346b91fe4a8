"""Generation pipeline tests (tiny configs): T2V/I2V/FLF2V + LoRA + EMA."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.pipelines.pipeline import (
    GenerateConfig, WanFLF2V, WanI2V, WanT2V, i2v_mask, latent_size_for,
)
from hyvideo_prfl_tpu.training import ema as ema_mod
from hyvideo_prfl_tpu.training import lora as lora_mod


def test_latent_size_for_720p():
    f, h, w = latent_size_for(720 * 1280, 720 / 1280, num_frames=81)
    assert f == 21
    assert h * 8 * w * 8 == 720 * 1280 or abs(h * w * 64 - 720 * 1280) < 64 * 64
    # 720p tokens: 21 * (90/2) * (160/2) = 75600 (SURVEY 5.7)
    assert f * (h // 2) * (w // 2) == 75600


def test_i2v_mask_structure():
    m = i2v_mask(3, 4, 4)
    assert m.shape == (3, 4, 4, 4)
    # frame 0: pixel frames (0,0,0,0) after 4x repeat of frame 0 -> all ones
    np.testing.assert_array_equal(np.asarray(m[0]), 1.0)
    np.testing.assert_array_equal(np.asarray(m[1:]), 0.0)
    m2 = i2v_mask(3, 4, 4, last_frame=True)
    # last latent frame covers pixel frames (6,7,8); pixel 8 is marked
    assert float(m2[-1].max()) == 1.0


def test_t2v_generate_euler_and_unipc():
    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    pipe = WanT2V(cfg, params)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim)) * 0.1
    ctx_null = jnp.zeros_like(ctx)
    for solver in ("euler", "unipc"):
        gen = GenerateConfig(sampling_steps=4, shift=3.0, sample_solver=solver)
        lat = pipe.generate(jax.random.PRNGKey(2), ctx, ctx_null, 2, 8, 8, gen)
        assert lat.shape == (1, 2, 8, 8, 16)
        assert np.isfinite(np.asarray(lat)).all()


def test_i2v_generate():
    cfg = wan_dit.tiny_test(model_type="i2v", in_dim=36, remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    pipe = WanI2V(cfg, params)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim)) * 0.1
    clip = jax.random.normal(jax.random.PRNGKey(2), (1, 257, 1280)) * 0.1
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 16)) * 0.1
    gen = GenerateConfig(sampling_steps=3, shift=3.0)
    lat = pipe.generate(jax.random.PRNGKey(4), ctx, jnp.zeros_like(ctx),
                        clip, cond, gen)
    assert lat.shape == (1, 2, 8, 8, 16)
    assert np.isfinite(np.asarray(lat)).all()


def test_flf2v_generate():
    cfg = wan_dit.tiny_test(model_type="flf2v", in_dim=36, remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    pipe = WanFLF2V(cfg, params)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim)) * 0.1
    # first+last frame CLIP tokens stacked on batch: [2B, 257, 1280]
    clip = jax.random.normal(jax.random.PRNGKey(2), (2, 257, 1280)) * 0.1
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 8, 8, 16)) * 0.1
    gen = GenerateConfig(sampling_steps=3, shift=3.0)
    lat = pipe.generate(jax.random.PRNGKey(4), ctx, jnp.zeros_like(ctx),
                        clip, cond, gen)
    assert lat.shape == (1, 3, 8, 8, 16)


def test_lora_zero_init_is_identity_and_trains():
    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    lora = lora_mod.lora_init(jax.random.PRNGKey(1), params, rank=4)
    merged = lora_mod.apply_lora(params, lora)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 16))
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim))
    m = wan_dit.WanModel(cfg)
    f0 = m.apply(params, x, jnp.asarray([500.0]), ctx,
                 output_features=True, selected_layers=(2,))
    f1 = m.apply(merged, x, jnp.asarray([500.0]), ctx,
                 output_features=True, selected_layers=(2,))
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)

    # gradient flows into lora only
    def loss(lora):
        p = lora_mod.apply_lora(params, lora)
        f = m.apply(p, x, jnp.asarray([500.0]), ctx,
                    output_features=True, selected_layers=(2,))
        return jnp.mean(f ** 2)

    g = jax.grad(loss)(lora)
    # at init B == 0, so dL/dA = dL/dDelta @ B^T == 0 exactly; B gets grads
    gb = float(jnp.abs(g["lora"]["self_attn"]["q"]["B"]).sum())
    assert np.isfinite(gb) and gb > 0


def test_lora_export_formats():
    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    lora = lora_mod.lora_init(jax.random.PRNGKey(1), params, rank=4)
    sd = lora_mod.lora_state_dict(lora, "transformer")
    assert "blocks.0.self_attn.q.lora_A.weight" in sd
    assert sd["blocks.0.self_attn.q.lora_A.weight"].shape == (4, cfg.dim)
    kohya = lora_mod.lora_state_dict(lora, "kohya")
    assert "lora_unet_blocks_0_self_attn_q.lora_down.weight" in kohya
    assert float(kohya["lora_unet_blocks_0_self_attn_q.alpha"]) == 4.0


def test_lora_export_roundtrip_and_merged_weight_parity():
    """Exported LoRA is numerically valid reference-side: the un-permuted
    q/k B factors reproduce the merged-weight delta in the reference layout
    (model_utils.py:17-67), and every format re-imports to the same tree."""
    from hyvideo_prfl_tpu.utils import checkpoint as ck

    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    lora = lora_mod.lora_init(jax.random.PRNGKey(1), params, rank=4)
    # randomize B so the delta is nonzero
    lora = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(7), a.shape) * 0.1,
        lora)

    merged = lora_mod.apply_lora(params, lora, scale=1.0)
    t_base = ck.flax_to_torch_state(params, cfg)
    t_merged = ck.flax_to_torch_state(merged, cfg)
    sd = lora_mod.lora_state_dict(lora, "transformer", head_dim=cfg.head_dim)

    for i in range(cfg.num_layers):
        for attn in ("self_attn", "cross_attn"):
            for m in ("q", "k", "v", "o"):
                key = f"blocks.{i}.{attn}.{m}"
                a = sd[f"{key}.lora_A.weight"]  # [r, in]
                b = sd[f"{key}.lora_B.weight"]  # [out, r]
                delta = (t_merged[f"{key}.weight"]
                         - t_base[f"{key}.weight"])  # [out, in]
                np.testing.assert_allclose(delta, b @ a, atol=1e-5,
                                           err_msg=key)

    # every export format re-imports to the identical tree
    for fmt in ("transformer", "kohya", "diffusers"):
        sd_f = lora_mod.lora_state_dict(lora, fmt, head_dim=cfg.head_dim)
        back = lora_mod.lora_from_state_dict(sd_f, head_dim=cfg.head_dim)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-6),
            lora, back)


def test_train_prfl_lora_save_path(tmp_path):
    """The use_lora CLI path runs its save_interval export without error
    (the reference peft save, train_prfl.py:320-333 + model_utils.py:38-67)."""
    import sys
    sys.path.insert(0, "scripts")
    from scripts.train_prfl import main as prfl_main
    from hyvideo_prfl_tpu.configs import load_config

    cfg = load_config("configs/smoke_prfl.yaml")
    cfg["save"]["output_dir"] = str(tmp_path)
    cfg["model"]["lora"]["use_lora"] = True
    cfg["model"]["lora"]["lora_rank"] = 4
    cfg["train"]["save_interval"] = 2
    state = prfl_main(cfg, max_steps=2)
    ckpt_dir = tmp_path / "smoke_prfl" / "checkpoint-2"
    for fmt in ("transformer", "kohya", "diffusers"):
        assert (ckpt_dir / f"lora_{fmt}.safetensors").exists()
    assert "lora" in state.params


def test_ema_update_moves_toward_params():
    p = {"w": jnp.zeros((4,))}
    e = ema_mod.ema_init(p)
    p2 = {"w": jnp.ones((4,))}
    e2 = ema_mod.ema_update(e, p2, decay=0.9)
    np.testing.assert_allclose(np.asarray(e2["w"]), 0.1, atol=1e-6)


def test_batched_cfg_matches_sequential():
    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), hk.shape) * 0.02)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim)) * 0.1
    ctx_null = jnp.zeros_like(ctx)
    gen = GenerateConfig(sampling_steps=3, shift=3.0)
    rng = jax.random.PRNGKey(2)
    p_b = WanT2V(cfg, params, batch_cfg=True)
    p_s = WanT2V(cfg, params, batch_cfg=False)
    lat_b = p_b.generate(rng, ctx, ctx_null, 2, 8, 8, gen)
    lat_s = p_s.generate(rng, ctx, ctx_null, 2, 8, 8, gen)
    np.testing.assert_allclose(np.asarray(lat_b), np.asarray(lat_s),
                               atol=2e-4, rtol=2e-4)


def test_dpm_solver_in_pipeline():
    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    pipe = WanT2V(cfg, params)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim)) * 0.1
    gen = GenerateConfig(sampling_steps=4, shift=3.0, sample_solver="dpm++")
    lat = pipe.generate(jax.random.PRNGKey(2), ctx, jnp.zeros_like(ctx), 2, 8, 8, gen)
    assert lat.shape == (1, 2, 8, 8, 16)
    assert np.isfinite(np.asarray(lat)).all()


@pytest.mark.parametrize("size", ["720*1280", "1280*720", "480*832",
                                  "832*480"])
@pytest.mark.parametrize("sp", [1, 2, 4, 8])
def test_latent_size_divisible_by_sp(size, sp):
    """Token count must divide ring*ulysses for every SIZE_CONFIG bucket
    (VERDICT r2 item 8; reference rounds seq_len to sp multiples,
    image2video.py:246-248 — we widen W instead)."""
    from hyvideo_prfl_tpu.configs import MAX_AREA_CONFIGS, SIZE_CONFIGS
    from hyvideo_prfl_tpu.pipelines.pipeline import latent_size_for

    w, h = SIZE_CONFIGS[size]
    f, lh, lw = latent_size_for(MAX_AREA_CONFIGS[size], h / w,
                                num_frames=81, sp_size=sp)
    tokens = f * (lh // 2) * (lw // 2)
    assert tokens % sp == 0
    # widening stays small: < 3% over the sp=1 budget
    _, lh0, lw0 = latent_size_for(MAX_AREA_CONFIGS[size], h / w,
                                  num_frames=81, sp_size=1)
    assert lh == lh0 and lw0 <= lw <= lw0 * 1.03 + 2
