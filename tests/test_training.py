"""End-to-end training step tests on tiny configs (the minimum e2e slice).

These exercise model + scheduler + reward heads + optimizer together, the
JAX analog of the reference's torchrun smoke runs on temp_data fixtures.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.schedulers import flow_match as fm
from hyvideo_prfl_tpu.training import common
from hyvideo_prfl_tpu.training.pavrm import (
    PavrmConfig, PavrmModel, make_train_step, classification_metrics,
)
from hyvideo_prfl_tpu.training.prfl import (
    PrflConfig, PrflModel, make_refl_step, make_sft_step,
)


def _tiny_dit(**kw):
    return wan_dit.tiny_test(remat=False, **kw)


def _batch(key, b=2, f=4, h=8, w=8, cfg=None, with_labels=True):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    batch = {
        "latents": jax.random.normal(ks[0], (b, f, h, w, 16)),
        "text": jax.random.normal(ks[1], (b, cfg.text_len, cfg.text_dim)) * 0.1,
    }
    if with_labels:
        batch["labels"] = jnp.asarray([1.0, 0.0][:b])
    return batch


def test_pavrm_ce_step_runs_and_learns():
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="ce", feature_layer=(2,), trainable_blocks=(0, 1))
    model = PavrmModel(dit_cfg, pc)
    trainable, frozen = model.init_all(jax.random.PRNGKey(0))
    sched = fm.train_schedule(1000)
    tx = common.make_optimizer(learning_rate=1e-3)
    state = common.init_train_state(trainable, tx)
    step0 = jax.jit(make_train_step(model, tx, sched))
    step = lambda s, b, k: step0(s, b, k, frozen)

    # learnable signal: positive clips have +1 mean latent, negative -1
    base = _batch(1, cfg=dit_cfg)
    batch = dict(base)
    shift = jnp.asarray([1.0, -1.0]).reshape(2, 1, 1, 1, 1)
    batch["latents"] = jax.random.normal(
        jax.random.PRNGKey(7), batch["latents"].shape
    ) * 0.1 + shift

    losses = []
    rng = jax.random.PRNGKey(42)
    for i in range(12):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, batch, k)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses}"
    assert int(state.step) == 12


def test_pavrm_bt_step_runs():
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="bt", feature_layer=(2,))
    model = PavrmModel(dit_cfg, pc)
    trainable, frozen = model.init_all(jax.random.PRNGKey(0))
    sched = fm.train_schedule(1000)
    tx = common.make_optimizer(learning_rate=1e-3)
    state = common.init_train_state(trainable, tx)
    step0 = jax.jit(make_train_step(model, tx, sched))
    step = lambda s, b, k: step0(s, b, k, frozen)
    batch = _batch(2, cfg=dit_cfg, with_labels=False)
    batch["latents_lose"] = jax.random.normal(
        jax.random.PRNGKey(9), batch["latents"].shape
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_pavrm_fixed_timestep_cycling():
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="ce", feature_layer=(1,), timesteps=(100, 500, 900))
    model = PavrmModel(dit_cfg, pc)
    trainable, frozen = model.init_all(jax.random.PRNGKey(0))
    sched = fm.train_schedule(1000)
    tx = common.make_optimizer()
    state = common.init_train_state(trainable, tx)
    step0 = jax.jit(make_train_step(model, tx, sched))
    step = lambda s, b, k: step0(s, b, k, frozen)
    batch = _batch(3, cfg=dit_cfg)
    for _ in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


def test_prfl_refl_step_updates_policy():
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="ce", feature_layer=(2,))
    prfl_cfg = PrflConfig(inference_steps=6, flow_shift=3.0)
    model = PrflModel(dit_cfg, pc, prfl_cfg)
    policy_params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    lrm_trainable, lrm_frozen = model.lrm.init_all(jax.random.PRNGKey(1))
    lrm_dit = common.merge_tree(
        {"params": {"blocks": lrm_trainable["blocks"]}}, lrm_frozen
    )
    tx = common.make_optimizer(learning_rate=1e-4)
    state = common.init_train_state(policy_params, tx)
    lrm_tower = {"dit": lrm_dit, "q": {"params": lrm_trainable["q_attn"]},
                 "m": {"params": lrm_trainable["mlp"]}}
    step0 = jax.jit(make_refl_step(model, tx))
    step = lambda s, b, k: step0(s, b, k, lrm_tower)
    batch = _batch(3, b=1, cfg=dit_cfg, with_labels=False)
    p0 = jax.tree.leaves(state.params)[5].copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["reward"]) <= 1.0
    assert 0 <= int(metrics["mid"]) < 5
    # policy must have moved (hinge is active since sigmoid(r) < 2 always)
    p1 = jax.tree.leaves(state.params)[5]
    assert float(jnp.abs(p1 - p0).max()) > 0


def test_prfl_sft_step():
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(feature_layer=(2,))
    prfl_cfg = PrflConfig(inference_steps=6)
    model = PrflModel(dit_cfg, pc, prfl_cfg)
    params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    sched = fm.train_schedule(1000)
    tx = common.make_optimizer(learning_rate=1e-3)
    state = common.init_train_state(params, tx)
    step = jax.jit(make_sft_step(model, tx, sched))
    batch = _batch(4, b=2, cfg=dit_cfg, with_labels=False)
    losses = []
    k = jax.random.PRNGKey(0)  # fixed rng: same (t, noise) every step
    for _ in range(8):
        state, m = step(state, batch, k)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # v-target MSE from zero-init head starts at E||eps - x0||^2 ~ 2
    assert losses[-1] < losses[0]


def test_grad_accumulation_only_updates_every_k():
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(feature_layer=(2,))
    model = PrflModel(dit_cfg, pc, PrflConfig())
    params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    sched = fm.train_schedule(1000)
    tx = common.make_optimizer(learning_rate=1e-3, gradient_accumulation_steps=2)
    state = common.init_train_state(params, tx)
    step = jax.jit(make_sft_step(model, tx, sched))
    batch = _batch(5, b=1, cfg=dit_cfg, with_labels=False)
    leaf = lambda s: np.asarray(jax.tree.leaves(s.params)[3])
    p0 = leaf(state)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    p1 = leaf(state)
    np.testing.assert_array_equal(p0, p1)  # accumulating, no update yet
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    p2 = leaf(state)
    assert np.abs(p2 - p1).max() > 0  # applied at k=2


def test_i2v_condition_mask():
    """4-channel mask concat (train_prfl.py:537-542): ones on latent frame 0
    (+ last frame for flf2v), zeros elsewhere; 20-channel pass-through."""
    cond = jnp.ones((2, 5, 4, 4, 16))
    y = common.i2v_condition(cond)
    assert y.shape == (2, 5, 4, 4, 20)
    np.testing.assert_array_equal(np.asarray(y[:, 0, :, :, :4]), 1.0)
    np.testing.assert_array_equal(np.asarray(y[:, 1:, :, :, :4]), 0.0)
    np.testing.assert_array_equal(np.asarray(y[..., 4:]), np.asarray(cond))
    y2 = common.i2v_condition(cond, flf2v=True)
    np.testing.assert_array_equal(np.asarray(y2[:, -1, :, :, :4]), 1.0)
    np.testing.assert_array_equal(np.asarray(y2[:, 1:-1, :, :, :4]), 0.0)
    # already-20-channel cond passes through (reference int(c)==16 check)
    assert common.i2v_condition(y) is y
    assert common.i2v_condition(None) is None
    # flf2v CLIP stacking: [B, 514, D] -> [2B, 257, D]
    clip = jnp.arange(2 * 514 * 3, dtype=jnp.float32).reshape(2, 514, 3)
    r = common.reshape_clip(clip)
    assert r.shape == (4, 257, 3)
    np.testing.assert_array_equal(np.asarray(r[1]), np.asarray(clip[0, 257:]))


def _i2v_batch(key, b=1, f=4, h=8, w=8, cfg=None):
    """Dataset-shaped i2v batch: 16-channel f1_black cond + raw CLIP embeds
    (the exact shapes LatentCacheDataset emits)."""
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    return {
        "latents": jax.random.normal(ks[0], (b, f, h, w, 16)),
        "text": jax.random.normal(ks[1], (b, cfg.text_len, cfg.text_dim)) * 0.1,
        "cond": jax.random.normal(ks[2], (b, f, h, w, 16)) * 0.5,
        "clip_fea": jax.random.normal(ks[3], (b, 257, 1280)) * 0.1,
    }


def test_prfl_refl_step_i2v():
    """The flagship i2v PRFL step trains end-to-end from dataset-shaped
    conditioning (16-ch cond -> 20-ch mask+cond -> in_dim 36 DiT)."""
    dit_cfg = _tiny_dit(model_type="i2v", in_dim=36)
    pc = PavrmConfig(loss="ce", feature_layer=(2,), task="i2v-1.3b")
    prfl_cfg = PrflConfig(inference_steps=4, flow_shift=3.0, is_i2v=True)
    model = PrflModel(dit_cfg, pc, prfl_cfg)
    policy_params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    lrm_trainable, lrm_frozen = model.lrm.init_all(jax.random.PRNGKey(1))
    lrm_tower = {
        "dit": common.merge_tree(
            {"params": {"blocks": lrm_trainable["blocks"]}}, lrm_frozen),
        "q": {"params": lrm_trainable["q_attn"]},
        "m": {"params": lrm_trainable["mlp"]},
    }
    tx = common.make_optimizer(learning_rate=1e-4)
    state = common.init_train_state(policy_params, tx)
    refl = jax.jit(make_refl_step(model, tx))
    sft = jax.jit(make_sft_step(model, tx, fm.train_schedule(1000)))
    batch = _i2v_batch(11, cfg=dit_cfg)
    state, m = refl(state, batch, jax.random.PRNGKey(2), lrm_tower)
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0
    state, m2 = sft(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m2["loss"]))


def test_pavrm_ce_step_i2v():
    dit_cfg = _tiny_dit(model_type="i2v", in_dim=36)
    pc = PavrmConfig(loss="ce", feature_layer=(2,), trainable_blocks=(0, 1),
                     task="i2v-14b-720p")
    assert pc.is_i2v and not pc.is_flf2v
    model = PavrmModel(dit_cfg, pc)
    trainable, frozen = model.init_all(jax.random.PRNGKey(0))
    tx = common.make_optimizer(learning_rate=1e-3)
    state = common.init_train_state(trainable, tx)
    step = jax.jit(make_train_step(model, tx, fm.train_schedule(1000)))
    batch = _i2v_batch(12, b=2, cfg=dit_cfg)
    batch["labels"] = jnp.asarray([1.0, 0.0])
    state, m = step(state, batch, jax.random.PRNGKey(1), frozen)
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0


def test_pavrm_bt_step_flf2v():
    """flf2v: first+last-frame mask, stacked 514-token CLIP context."""
    dit_cfg = _tiny_dit(model_type="flf2v", in_dim=36)
    pc = PavrmConfig(loss="bt", feature_layer=(2,), task="flf2v-14b-720p")
    assert pc.is_flf2v
    model = PavrmModel(dit_cfg, pc)
    trainable, frozen = model.init_all(jax.random.PRNGKey(0))
    tx = common.make_optimizer(learning_rate=1e-3)
    state = common.init_train_state(trainable, tx)
    step = jax.jit(make_train_step(model, tx, fm.train_schedule(1000)))
    batch = _i2v_batch(13, b=1, cfg=dit_cfg)
    # flf2v CLIP embeds arrive stacked [B, 2*257, 1280]
    batch["clip_fea"] = jnp.concatenate(
        [batch["clip_fea"], batch["clip_fea"]], axis=1)
    batch["latents_lose"] = jax.random.normal(
        jax.random.PRNGKey(9), batch["latents"].shape)
    batch["cond_lose"] = batch["cond"] * 0.3
    state, m = step(state, batch, jax.random.PRNGKey(1), frozen)
    assert np.isfinite(float(m["loss"]))


def test_classification_metrics():
    probs = np.asarray([0.9, 0.8, 0.3, 0.1])
    labels = np.asarray([1, 0, 1, 0])
    m = classification_metrics(probs, labels)
    assert m["accuracy"] == 0.5
    assert m["precision"] == 0.5
    assert m["recall"] == 0.5
    assert m["f1"] == 0.5


def test_prfl_lora_mode_trains_only_lora():
    """PRFL with LoRA: only the low-rank tree updates; base stays frozen."""
    from hyvideo_prfl_tpu.training import lora as lora_mod

    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="ce", feature_layer=(2,))
    prfl_cfg = PrflConfig(inference_steps=4, flow_shift=3.0)
    model = PrflModel(dit_cfg, pc, prfl_cfg)
    base_params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    # zero-init head blocks gradients to everything upstream; randomize it
    hk = base_params["params"]["head"]["head"]["kernel"]
    base_params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), hk.shape) * 0.02)
    lora = lora_mod.lora_init(jax.random.PRNGKey(1), base_params, rank=4)
    lrm_trainable, lrm_frozen = model.lrm.init_all(jax.random.PRNGKey(2))
    lrm_tower = {
        "dit": common.merge_tree(
            {"params": {"blocks": lrm_trainable["blocks"]}}, lrm_frozen),
        "q": {"params": lrm_trainable["q_attn"]},
        "m": {"params": lrm_trainable["mlp"]},
        "base": base_params,
    }
    tx = common.make_optimizer(learning_rate=1e-3)
    state = common.init_train_state(lora, tx)
    step0 = jax.jit(make_refl_step(model, tx, lora_mode=True))
    batch = _batch(6, b=1, cfg=dit_cfg, with_labels=False)
    state, m = step0(state, batch, jax.random.PRNGKey(3), lrm_tower)
    assert np.isfinite(float(m["loss"]))
    # the B matrices must have moved away from zero-init
    b_sum = float(jnp.abs(state.params["lora"]["self_attn"]["q"]["B"]).sum())
    assert b_sum > 0


def test_validate_params():
    good = {"a": jnp.ones((4,)), "b": {"c": jnp.zeros((2,))}}
    h = common.validate_params(good)
    assert h["finite"] and not h["bad"]
    bad = {"a": jnp.ones((4,)), "b": {"c": jnp.asarray([1.0, np.nan])}}
    h = common.validate_params(bad)
    assert not h["finite"] and "c" in h["bad"][0]


def test_offload_opt_state_step():
    """Pinned-host optimizer-state offload: make_sharded_state stores
    moments host-side, apply_grads streams them on-device inside the jitted
    step, and the update matches the non-offloaded step exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scripts._common import make_sharded_state
    from hyvideo_prfl_tpu.parallel import sharding as shd
    from hyvideo_prfl_tpu.training import common

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8-device mesh")
    mesh = shd.make_mesh(data=2, sp=4)
    params = {"params": {"w": jnp.ones((256, 256)), "b": jnp.zeros((256,))}}
    tx = common.make_optimizer(learning_rate=1e-2)
    grads = jax.tree.map(lambda a: jnp.full_like(a, 0.1), params)

    with jax.set_mesh(mesh):
        state_off, transfer, st_sh = make_sharded_state(mesh, params, tx,
                                                        offload_opt=True)
        assert transfer is not None
        assert any("pinned_host" == s.memory_kind
                   for s in jax.tree.leaves(transfer[1]))
        state_ref, _, _ = make_sharded_state(mesh, params, tx,
                                             offload_opt=False)

        @jax.jit
        def step_off(state, grads):
            return common.apply_grads(state, tx, grads,
                                      opt_transfer=transfer)

        @jax.jit
        def step_ref(state, grads):
            return common.apply_grads(state, tx, grads)

        s1, g1 = step_off(state_off, grads)
        s2, g2 = step_ref(state_ref, grads)
    np.testing.assert_allclose(np.asarray(s1.params["params"]["w"]),
                               np.asarray(s2.params["params"]["w"]),
                               atol=1e-7)
    assert abs(float(g1) - float(g2)) < 1e-6


def test_lr_schedule_diffusers_surface():
    """constant_with_warmup / polynomial / cosine(+restarts) match the
    diffusers get_scheduler formulas the reference passes num_cycles/power
    into (train_prfl.py:479-505)."""
    import numpy as np

    from hyvideo_prfl_tpu.training.common import _lr_schedule

    lr = 1e-3
    s = _lr_schedule(lr, "constant_with_warmup", 10, 100)
    np.testing.assert_allclose(float(s(5)), lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), lr, rtol=1e-6)

    s = _lr_schedule(lr, "polynomial", 0, 100, lr_power=2.0)
    np.testing.assert_allclose(float(s(50)),
                               (lr - 1e-7) * 0.25 + 1e-7, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-7, rtol=1e-6)

    # plain cosine ignores lr_num_cycles (diffusers only forwards it to
    # cosine_with_restarts): half-cosine decay, 0 at the end, lr/2 at mid.
    s = _lr_schedule(lr, "cosine", 0, 100, lr_num_cycles=1)
    np.testing.assert_allclose(float(s(0)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 0.5 * lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-9)

    # hard restarts: 2 cycles -> lr back at the cycle boundary; 0 at/after
    # the end of the schedule (diffusers returns 0 once progress >= 1.0).
    s = _lr_schedule(lr, "cosine_with_restarts", 0, 100, lr_num_cycles=2)
    np.testing.assert_allclose(float(s(25)), lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(51)),
                               lr * 0.5 * (1 + np.cos(np.pi * ((2 * 0.51) % 1))),
                               rtol=1e-4)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(s(150)), 0.0, atol=1e-9)

    import pytest

    with pytest.raises(ValueError):
        _lr_schedule(lr, "nope", 0, 100)
