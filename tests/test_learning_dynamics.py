"""Learning-DYNAMICS tests: the objectives optimize what they should.

VERDICT r4 next #2: the mechanics ("one step moves params") were pinned in
test_training.py, but nothing showed the PRFL reward actually RISING over a
multi-step run — the reference's entire reason to exist (its README reports
+56 dynamic degree from this objective; the hinge backprop chain is
reference train_prfl.py:585-898). Three dynamics assertions:

1. test_prfl_reward_rises — a multi-step PRFL run against a FIXED frozen
   LRM drives the LRM's reward up (hinge loss down) through the full
   backprop chain: reward head -> trimmed-DiT features -> UniPC solver
   step -> policy DiT forward.
2. test_pavrm_bt_learns — the Bradley-Terry siamese objective reaches
   above-chance preference accuracy on held-out pairs when win/lose are
   separable by construction (reference train_pavrm.py:828-869).
3. test_pavrm_to_prfl_handoff_cli — the reference's actual workflow as one
   test: train_pavrm smoke run -> saved transformer/mlp/query_attention
   reference-format artifacts -> train_prfl loads them via
   model.lrm_*_path (reference train_prfl.py:255-314) -> reward rises
   across the logged steps.
"""

import os
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.training import common
from hyvideo_prfl_tpu.training.pavrm import (
    PavrmConfig, PavrmModel, make_train_step,
)
from hyvideo_prfl_tpu.training.prfl import (
    PrflConfig, PrflModel, make_refl_step,
)


def _tiny_dit(**kw):
    return wan_dit.tiny_test(remat=False, **kw)


def _randomize_head(params, key, scale=0.02):
    """The DiT head is zeros-init (adaLN convention): v == 0 at init, which
    makes the first rollout degenerate. Give it a small random kernel so the
    policy's velocity responds to its inputs from step 0."""
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(key, hk.shape) * scale)
    return params


def test_prfl_reward_rises():
    """Multi-step PRFL vs a fixed random-but-frozen LRM: the hinge
    0.1*relu(2 - sigmoid(r)) is always active (sigmoid < 1 < 2), so the
    policy must climb the LRM's reward surface. Fixed rng (same noise +
    same mid every step) makes it a deterministic optimization whose
    progress we can assert tightly."""
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="ce", feature_layer=(2,))
    prfl_cfg = PrflConfig(inference_steps=6, flow_shift=3.0, fixed_mid=3)
    model = PrflModel(dit_cfg, pc, prfl_cfg)
    policy_params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    policy_params = _randomize_head(policy_params, jax.random.PRNGKey(9))
    lrm_trainable, lrm_frozen = model.lrm.init_all(jax.random.PRNGKey(1))
    lrm_tower = {
        "dit": common.merge_tree(
            {"params": {"blocks": lrm_trainable["blocks"]}}, lrm_frozen),
        "q": {"params": lrm_trainable["q_attn"]},
        "m": {"params": lrm_trainable["mlp"]},
    }
    tx = common.make_optimizer(learning_rate=1e-3)
    state = common.init_train_state(policy_params, tx)
    step0 = jax.jit(make_refl_step(model, tx))

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    batch = {
        "latents": jax.random.normal(ks[0], (1, 4, 8, 8, 16)),
        "text": jax.random.normal(ks[1], (1, dit_cfg.text_len,
                                          dit_cfg.text_dim)) * 0.1,
    }
    fixed_rng = jax.random.PRNGKey(5)
    rewards, losses = [], []
    for _ in range(30):
        state, m = step0(state, batch, fixed_rng, lrm_tower)
        rewards.append(float(m["reward"]))
        losses.append(float(m["loss"]))
    assert np.isfinite(rewards).all() and np.isfinite(losses).all()
    # the reward must RISE and the hinge must FALL — dynamics, not mechanics
    assert rewards[-1] > rewards[0] + 0.02, (
        f"reward did not rise: {rewards[0]:.4f} -> {rewards[-1]:.4f}\n"
        f"{np.round(rewards, 4)}")
    assert losses[-1] < losses[0], f"hinge did not fall: {losses}"
    # deterministic objective: the trend should be essentially monotone
    r = np.asarray(rewards)
    assert (np.diff(r) > -1e-3).mean() > 0.8, f"non-monotone: {r}"


def test_pavrm_bt_learns():
    """Bradley-Terry siamese objective on separable pairs (win = +1 mean
    shift, lose = -1): training accuracy climbs from chance to ~1, and the
    learned preference TRANSFERS to held-out pairs drawn with fresh noise
    (reference train_pavrm.py:828-869 forward_siamese + BCE-vs-ones)."""
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="bt", feature_layer=(2,), trainable_blocks=(0, 1))
    model = PavrmModel(dit_cfg, pc)
    trainable, frozen = model.init_all(jax.random.PRNGKey(0))
    from hyvideo_prfl_tpu.schedulers import flow_match as fm

    sched = fm.train_schedule(1000)
    tx = common.make_optimizer(learning_rate=2e-3)
    state = common.init_train_state(trainable, tx)
    step0 = jax.jit(make_train_step(model, tx, sched))

    def make_pairs(seed, b=2):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        shape = (b, 4, 8, 8, 16)
        return {
            "latents": jax.random.normal(ks[0], shape) * 0.1 + 1.0,
            "latents_lose": jax.random.normal(ks[1], shape) * 0.1 - 1.0,
            "text": jax.random.normal(ks[2], (b, dit_cfg.text_len,
                                              dit_cfg.text_dim)) * 0.1,
        }

    accs, losses = [], []
    rng = jax.random.PRNGKey(42)
    for i in range(30):
        rng, k = jax.random.split(rng)
        state, m = step0(state, make_pairs(i), k, frozen)
        accs.append(float(m["acc"]))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, f"bt loss did not fall: {losses}"
    assert np.mean(accs[-5:]) >= 0.9, f"train acc stayed at chance: {accs}"

    # held-out generalization: fresh pairs (unseen noise draws), params
    # frozen — metrics["acc"] of a step evaluates the loss at the CURRENT
    # params on the given batch before updating, which is exactly the
    # held-out accuracy we want
    _, m_holdout = step0(state, make_pairs(777, b=4),
                         jax.random.PRNGKey(999), frozen)
    assert float(m_holdout["acc"]) >= 0.75, (
        f"no transfer to held-out pairs: acc={float(m_holdout['acc'])}")


def test_pavrm_to_prfl_handoff_cli(tmp_path):
    """The reference's full workflow as ONE test (train_pavrm.py:978-998
    artifact saves -> train_prfl.py:255-314 lrm_* loads):

    1. train_pavrm smoke run exports reference-format artifacts
       (transformer/checkpoint-N wan layout + mlp/query_attention torch
       ckpts);
    2. the torch-format heads round-trip bit-close vs the orbax tree;
    3. train_prfl consumes them via model.lrm_*_path and the logged reward
       RISES over the run against that trained-and-frozen LRM.
    """
    from hyvideo_prfl_tpu.configs import load_config
    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from scripts.train_pavrm import main as pavrm_main
    from scripts.train_prfl import main as prfl_main

    outdir = str(tmp_path)
    cfg = load_config("configs/smoke_pavrm.yaml")
    cfg["save"]["output_dir"] = outdir
    cfg["train"]["save_interval"] = 2
    pavrm_main(cfg, max_steps=2)

    pav_dir = os.path.join(outdir, "smoke_pavrm")
    tdir = os.path.join(pav_dir, "transformer", "checkpoint-2")
    mlp_ckpt = os.path.join(pav_dir, "mlp", "mlp_step_2.ckpt")
    qat_ckpt = os.path.join(pav_dir, "mlp", "query_attention_step_2.ckpt")
    for p in (tdir, mlp_ckpt, qat_ckpt):
        assert os.path.exists(p), f"missing handoff artifact {p}"
    with open(os.path.join(tdir, "config.json")) as f:
        import json

        assert json.load(f)["num_layers"] == 2  # trimmed to feature_layer

    # the torch-format heads round-trip against the orbax trainable tree
    saved = ck.load_orbax(os.path.join(pav_dir, "checkpoint-2"))
    mh = ck.load_reward_head(mlp_ckpt, "mlp")["params"]
    np.testing.assert_allclose(
        np.asarray(mh["Dense_0"]["kernel"]),
        np.asarray(saved["mlp"]["Dense_0"]["kernel"]), atol=1e-6)
    qh = ck.load_reward_head(qat_ckpt, "qattn")["params"]
    np.testing.assert_allclose(np.asarray(qh["wq"]),
                               np.asarray(saved["q_attn"]["wq"]), atol=1e-6)

    pcfg = load_config("configs/smoke_prfl.yaml")
    pcfg["save"]["output_dir"] = outdir
    pcfg["model"]["lrm_transformer_path"] = tdir
    pcfg["model"]["lrm_mlp_path"] = mlp_ckpt
    pcfg["model"]["lrm_query_attention_path"] = qat_ckpt
    pcfg["train"]["fixed_mid"] = 1
    pcfg["optimizer"]["learning_rate"] = 1e-3
    n_steps = 20
    state = prfl_main(pcfg, max_steps=n_steps)
    assert int(state.step) > 0

    log_file = os.path.join(outdir, "smoke_prfl", "logs", "log.txt")
    assert os.path.exists(log_file)
    rewards = []
    with open(log_file) as f:
        for line in f:
            m = re.search(r"\breward=([0-9.]+)", line)
            if m:
                rewards.append(float(m.group(1)))
    assert len(rewards) == n_steps, f"expected {n_steps} logged rewards"
    assert np.isfinite(rewards).all()
    first, last = np.mean(rewards[:5]), np.mean(rewards[-5:])
    assert last > first + 0.01, (
        f"reward did not rise through the CLI chain: "
        f"{first:.4f} -> {last:.4f}\n{np.round(rewards, 4)}")


def test_export_lrm_artifacts_i2v_roundtrip(tmp_path):
    """The handoff export/reload surface for the flagship i2v task: the
    trimmed head-less transformer keeps img_emb (CLIP context MLP) and the
    36-channel patch embedding, round-trips through the wan safetensors
    layout with the exact key surface, and the heads round-trip through
    the torch ckpt format (reference train_pavrm.py:978-998 for i2v
    configs)."""
    import dataclasses

    from hyvideo_prfl_tpu.training import common as tcommon
    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from scripts.train_pavrm import export_lrm_artifacts

    dit_cfg = _tiny_dit(model_type="i2v", in_dim=36)
    pc = PavrmConfig(loss="ce", feature_layer=(2,), trainable_blocks=(0, 1),
                     task="i2v-14b-720p")
    model = PavrmModel(dit_cfg, pc)
    trainable, frozen = model.init_all(jax.random.PRNGKey(0))
    export_lrm_artifacts(jax.device_get(trainable), jax.device_get(frozen),
                         model, str(tmp_path), 7)

    tdir = os.path.join(str(tmp_path), "transformer", "checkpoint-7")
    assert os.path.isdir(tdir)
    # reload through the trimmed-config path train_prfl.py uses
    import json

    with open(os.path.join(tdir, "config.json")) as f:
        meta = json.load(f)
    assert meta["num_layers"] == 2 and meta["model_type"] == "i2v"
    loaded = ck.load_wan_checkpoint(
        tdir, dataclasses.replace(dit_cfg, num_layers=2))
    assert "head" not in loaded["params"]
    assert "img_emb" in loaded["params"]
    ref = tcommon.merge_tree(
        {"params": {"blocks": trainable["blocks"]}}, frozen)
    for path in (("img_emb",), ("patch_embedding",), ("blocks",)):
        a = loaded["params"]
        b = ref["params"]
        for k in path:
            a, b = a[k], b[k]
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-6)
    mh = ck.load_reward_head(
        os.path.join(str(tmp_path), "mlp", "mlp_step_7.ckpt"), "mlp")
    np.testing.assert_allclose(
        np.asarray(mh["params"]["Dense_1"]["kernel"]),
        np.asarray(trainable["mlp"]["Dense_1"]["kernel"]), atol=1e-6)


def test_prfl_moves_toward_learned_preference():
    """The deepest dynamics assertion: train the LRM to a KNOWN preference
    (positive-mean latents = good, negative = bad — separable by
    construction), freeze it, then run PRFL and verify the policy moves its
    generations TOWARD the preferred direction (mean of the post-step
    latent rises), not merely up some random reward surface. This is the
    tiny-scale analog of the reference's published effect (README.md:12,
    :86: PRFL raising the preference metrics the PAVRM was trained on)."""
    from hyvideo_prfl_tpu.schedulers import flow_match as fm
    from hyvideo_prfl_tpu.training.pavrm import make_train_step

    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="ce", feature_layer=(2,), trainable_blocks=(0, 1))
    lrm_model = PavrmModel(dit_cfg, pc)
    trainable, frozen = lrm_model.init_all(jax.random.PRNGKey(0))
    tx_lrm = common.make_optimizer(learning_rate=2e-3)
    lrm_state = common.init_train_state(trainable, tx_lrm)
    lrm_step = jax.jit(make_train_step(lrm_model, tx_lrm,
                                       fm.train_schedule(1000)))

    # teach the preference: positive-mean latents labeled 1, negative 0
    shift = jnp.asarray([1.0, -1.0]).reshape(2, 1, 1, 1, 1)
    rng = jax.random.PRNGKey(11)
    losses = []
    for i in range(15):
        rng, k1, k2 = jax.random.split(rng, 3)
        batch = {
            "latents": jax.random.normal(k1, (2, 4, 8, 8, 16)) * 0.1 + shift,
            "text": jax.random.normal(k2, (2, dit_cfg.text_len,
                                           dit_cfg.text_dim)) * 0.1,
            "labels": jnp.asarray([1.0, 0.0]),
        }
        lrm_state, m = lrm_step(lrm_state, batch, k1, frozen)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], f"LRM never learned: {losses}"

    # freeze the LEARNED preference as the PRFL reward tower
    lrm_tower = {
        "dit": common.merge_tree(
            {"params": {"blocks": lrm_state.params["blocks"]}}, frozen),
        "q": {"params": lrm_state.params["q_attn"]},
        "m": {"params": lrm_state.params["mlp"]},
    }
    prfl_cfg = PrflConfig(inference_steps=6, flow_shift=3.0, fixed_mid=3)
    model = PrflModel(dit_cfg, pc, prfl_cfg)
    policy_params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(2))
    policy_params = _randomize_head(policy_params, jax.random.PRNGKey(3))
    tx = common.make_optimizer(learning_rate=1e-3)
    state = common.init_train_state(policy_params, tx)
    refl = jax.jit(make_refl_step(model, tx))

    ks = jax.random.split(jax.random.PRNGKey(13), 2)
    batch = {
        "latents": jax.random.normal(ks[0], (1, 4, 8, 8, 16)),
        "text": jax.random.normal(ks[1], (1, dit_cfg.text_len,
                                          dit_cfg.text_dim)) * 0.1,
    }
    fixed_rng = jax.random.PRNGKey(17)
    rewards, means = [], []
    for _ in range(40):
        state, m = refl(state, batch, fixed_rng, lrm_tower)
        rewards.append(float(m["reward"]))
        means.append(float(jnp.mean(m["latent_next"])))
    assert np.isfinite(rewards).all() and np.isfinite(means).all()
    assert rewards[-1] > rewards[0] + 0.02, (
        f"reward did not rise vs the learned LRM: {np.round(rewards, 3)}")
    # the policy's generations must move in the PREFERRED direction
    # (positive mean), i.e. PRFL optimizes the preference the PAVRM
    # learned, not an arbitrary direction
    assert means[-1] > means[0] + 0.05, (
        f"latents did not move toward the learned preference: "
        f"{means[0]:.4f} -> {means[-1]:.4f}\n{np.round(means, 3)}")


def test_prfl_rollout_int8_learns():
    """Opt-in int8 NO-GRAD rollout (PrflConfig.rollout_quant): the 19-of-21
    forward-units that dominate the refl step run the W8A8+qk8 serving
    graph on live per-step-quantized weights, while the gradient-carrying
    step stays bf16/fp32. Must (a) stay finite, (b) track the bf16
    trajectory closely at step 0 (quantization perturbs only the
    stop_gradient mid-latent), and (c) still LEARN — reward rises."""
    dit_cfg = _tiny_dit()
    pc = PavrmConfig(loss="ce", feature_layer=(2,))
    policy_params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))
    policy_params = _randomize_head(policy_params, jax.random.PRNGKey(9))
    tx = common.make_optimizer(learning_rate=1e-3)

    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    batch = {
        "latents": jax.random.normal(ks[0], (1, 4, 8, 8, 16)),
        "text": jax.random.normal(ks[1], (1, dit_cfg.text_len,
                                          dit_cfg.text_dim)) * 0.1,
    }
    fixed_rng = jax.random.PRNGKey(5)

    results = {}
    for quant in (None, "int8"):
        prfl_cfg = PrflConfig(inference_steps=6, flow_shift=3.0,
                              fixed_mid=3, rollout_quant=quant)
        model = PrflModel(dit_cfg, pc, prfl_cfg)
        lrm_trainable, lrm_frozen = model.lrm.init_all(jax.random.PRNGKey(1))
        lrm_tower = {
            "dit": common.merge_tree(
                {"params": {"blocks": lrm_trainable["blocks"]}}, lrm_frozen),
            "q": {"params": lrm_trainable["q_attn"]},
            "m": {"params": lrm_trainable["mlp"]},
        }
        state = common.init_train_state(policy_params, tx)
        step = jax.jit(make_refl_step(model, tx))
        rewards = []
        for _ in range(20):
            state, m = step(state, batch, fixed_rng, lrm_tower)
            rewards.append(float(m["reward"]))
        assert np.isfinite(rewards).all()
        results[quant] = rewards

    r8 = results["int8"]
    assert r8[-1] > r8[0] + 0.02, (
        f"int8-rollout PRFL did not learn: {np.round(r8, 4)}")
    # step-0 reward evaluates the SAME initial params through the two
    # rollout graphs: int8 noise must be a perturbation, not a regime
    # change
    assert abs(r8[0] - results[None][0]) < 0.05, (
        f"int8 rollout diverged at step 0: {r8[0]} vs {results[None][0]}")
