"""Aux components: TeaCache, distill utils, data utils, profiling, eval CLI."""

import numpy as np
import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.ops import teacache as tc
from hyvideo_prfl_tpu.pipelines.pipeline import GenerateConfig, WanT2V
from hyvideo_prfl_tpu.training.distill import Discriminator, EulerSolver
from hyvideo_prfl_tpu.data.utils import (
    align_ceil_to, align_floor_to, crop_tensor, group_indices_by_length,
)
from hyvideo_prfl_tpu.utils.profiling import log_memory_usage


def test_teacache_gate_logic():
    state = tc.init_state(1, 8, 16)
    e0 = jnp.ones((1, 8))
    # step 0 always computes
    skip, state = tc.should_skip(state, e0, jnp.int32(0), 10, 0.5,
                                 tc.COEFFICIENTS["t2v-14b"])
    assert not bool(skip)
    # identical e => rel change 0 => poly(0) is the constant term; with a
    # huge threshold the next (non-final) step skips
    skip, state = tc.should_skip(state, e0, jnp.int32(1), 10, 1e9,
                                 tc.COEFFICIENTS["t2v-14b"])
    assert bool(skip)
    # last step always computes
    skip, state = tc.should_skip(state, e0, jnp.int32(9), 10, 1e9,
                                 tc.COEFFICIENTS["t2v-14b"])
    assert not bool(skip)


def test_model_skip_blocks_residual_identity():
    """skip_blocks=True with the true residual must reproduce the full
    forward exactly (the TeaCache cache-hit contract)."""
    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    m = wan_dit.WanModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim)) * 0.1
    t = jnp.asarray([500.0])
    out_full, e, res = m.apply(params, x, t, ctx, output_residual=True,
                               skip_blocks=jnp.asarray(False),
                               residual_in=jnp.zeros((1, 64, cfg.dim)))
    out_skip, _, res2 = m.apply(params, x, t, ctx, output_residual=True,
                                skip_blocks=jnp.asarray(True),
                                residual_in=res)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_skip),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res), np.asarray(res2), atol=1e-5)
    assert e.shape == (1, cfg.dim)


def test_time_embed_only_matches_model():
    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    m = wan_dit.WanModel(cfg)
    x = jnp.zeros((1, 4, 8, 8, 16))
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim))
    _, e_model, _ = m.apply(params, x, jnp.asarray([123.0]), ctx,
                            output_residual=True,
                            skip_blocks=jnp.asarray(False),
                            residual_in=jnp.zeros((1, 64, cfg.dim)))
    e_cheap = wan_dit.time_embed_only(params, cfg, jnp.asarray([123.0]))
    np.testing.assert_allclose(np.asarray(e_model), np.asarray(e_cheap),
                               atol=1e-5)


def test_teacache_sampling_runs_and_matches_low_thresh():
    """thresh=0 (never skip) must equal the plain sampler bitwise-ish."""
    cfg = wan_dit.tiny_test(remat=False)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    # randomize the zero-init head so block outputs actually reach the
    # velocity (otherwise skip == full trivially)
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), hk.shape) * 0.02)
    pipe = WanT2V(cfg, params)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim)) * 0.1
    ctx_null = jnp.zeros_like(ctx)
    gen = GenerateConfig(sampling_steps=4, shift=3.0, sample_solver="unipc")
    rng = jax.random.PRNGKey(7)
    plain = pipe.sample(rng, (1, 2, 8, 8, 16), ctx, ctx_null, gen)
    tc_out = pipe.sample_teacache(rng, (1, 2, 8, 8, 16), ctx, ctx_null, gen,
                                  thresh=-1.0, coeffs_key="t2v-1.3b")
    np.testing.assert_allclose(np.asarray(plain), np.asarray(tc_out),
                               atol=1e-4)
    # permissive threshold: still finite output (skipping engaged)
    tc_skip = pipe.sample_teacache(rng, (1, 2, 8, 8, 16), ctx, ctx_null, gen,
                                   thresh=1e9, coeffs_key="t2v-1.3b")
    assert np.isfinite(np.asarray(tc_skip)).all()
    assert float(jnp.abs(tc_skip - plain).max()) > 0  # skipping changed result
    # batched CFG (default) == sequential cond/uncond forwards, both regimes
    pipe_seq = WanT2V(cfg, params, batch_cfg=False)
    for thresh, batched in ((-1.0, tc_out), (1e9, tc_skip)):
        seq = pipe_seq.sample_teacache(rng, (1, 2, 8, 8, 16), ctx, ctx_null,
                                       gen, thresh=thresh,
                                       coeffs_key="t2v-1.3b")
        np.testing.assert_allclose(np.asarray(batched), np.asarray(seq),
                                   atol=1e-4)


def test_euler_solver_distill():
    sig = np.linspace(1, 0, 1001)
    sol = EulerSolver.make(sig, timesteps=1000, euler_timesteps=10)
    assert sol.indices.shape == (10,)
    x = jnp.ones((2, 4))
    v = jnp.full((2, 4), 0.5)
    y = sol.euler_step(x, v, jnp.int32(0))
    assert np.isfinite(np.asarray(y)).all()
    y2 = sol.euler_step_to_target(x, v, jnp.int32(0), jnp.int32(9))
    assert np.isfinite(np.asarray(y2)).all()
    # jump 0->9 equals sigma difference scaling
    expected = 1.0 - 0.5 * float(sig[sol.indices[0]] - sig[sol.indices[9]])
    np.testing.assert_allclose(np.asarray(y2)[0, 0], expected, rtol=1e-5)


def test_distill_phase_helpers():
    from hyvideo_prfl_tpu.training.distill import (
        extract_into_tensor, get_phase_endpoint,
    )
    # phase endpoints floor to interval boundaries, capped at the last phase
    assert [get_phase_endpoint(i, 32, 8) for i in (0, 3, 4, 27, 28, 31)] == \
        [0, 0, 4, 24, 28, 28]
    a = np.linspace(0, 1, 10, dtype=np.float32)
    out = extract_into_tensor(a, jnp.asarray([2, 7]), (2, 3, 4))
    assert out.shape == (2, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), a[[2, 7]])


def test_discriminator_heads():
    d = Discriminator(num_heads=2, inner_dim=64)
    feats = [jnp.ones((1, 8, 32)), jnp.ones((1, 8, 32))]
    params = d.init(jax.random.PRNGKey(0), feats)
    outs = d.apply(params, feats)
    assert len(outs) == 2 and outs[0].shape == (1, 8, 1)


def test_data_utils():
    assert align_floor_to(37, 8) == 32
    assert align_ceil_to(37, 8) == 40
    lat = np.arange(4 * 8 * 8 * 2, dtype=np.float32).reshape(4, 8, 8, 2)
    c = crop_tensor(lat, (1.0, 0.5, 0.5), "center")
    assert c.shape == (4, 4, 4, 2)
    order = group_indices_by_length([5, 1, 9, 3, 7, 2, 8, 4], 2, 1, seed=0)
    assert sorted(order) == list(range(8))


def test_log_memory_usage_runs():
    out = log_memory_usage("test")
    assert isinstance(out, dict)


def test_inference_pavrm_cli(tmp_path, monkeypatch):
    """Drive the eval CLI main() on smoke fixtures."""
    import sys
    sys.path.insert(0, "scripts")
    from scripts.inference_pavrm import main as eval_main
    from hyvideo_prfl_tpu.configs import load_config

    cfg = load_config("configs/smoke_pavrm.yaml")
    cfg["eval"]["timestep"] = [300, 700]
    results = eval_main(cfg, max_samples=4)
    assert "t=300" in results and "t=700" in results
    for r in results.values():
        assert 0.0 <= r["accuracy"] <= 1.0
        assert 0.0 <= r["mean_reward"] <= 1.0


def test_xlm_roberta():
    from hyvideo_prfl_tpu.models.xlm_roberta import (
        XLMRoberta, mean_pool, tiny_xlmr,
    )
    cfg = tiny_xlmr()
    m = XLMRoberta(cfg)
    ids = jnp.asarray([[5, 8, 9, 1, 1], [3, 1, 1, 1, 1]], jnp.int32)  # pad=1
    params = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (2, 5, cfg.dim)
    pooled = mean_pool(out, ids)
    assert pooled.shape == (2, cfg.dim)
    assert np.isfinite(np.asarray(pooled)).all()
    # padded tokens must not affect the pooled output of valid ones
    ids2 = ids.at[0, 4].set(1)  # already pad; change a pad position id
    out2 = m.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out[0, :3]), np.asarray(out2[0, :3]),
                               atol=1e-5)


def test_prompt_expander_local():
    from hyvideo_prfl_tpu.utils.prompt_extend import (
        DashScopePromptExpander, LocalPromptExpander,
    )
    exp = LocalPromptExpander(lambda sys, usr: f"detailed: {usr}")
    out = exp("a cat runs")
    assert out.status and out.prompt == "detailed: a cat runs"
    # failing generate_fn falls back to the original prompt
    exp2 = LocalPromptExpander(lambda s, u: 1 / 0)
    out2 = exp2("a cat runs")
    assert not out2.status and out2.prompt == "a cat runs"
    # dashscope unavailable in this deployment -> graceful failure
    out3 = DashScopePromptExpander()("a cat runs")
    assert not out3.status and out3.prompt == "a cat runs"


def test_tokenizer_text_cleaning():
    from hyvideo_prfl_tpu.utils.tokenizers import (
        basic_clean, canonicalize, whitespace_clean,
    )
    assert whitespace_clean("a   b\n\tc") == "a b c"
    assert basic_clean("&amp;amp; x ") == "& x"
    assert canonicalize("Hello, World_Foo!") == "hello world foo"


def test_shard_map_ulysses_matches_single_device(devices8):
    """Explicit all_to_all Ulysses == single-device attention."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.ops.attention import (
        _xla_attention, ulysses_attention,
    )
    from hyvideo_prfl_tpu.parallel import sharding as shd

    mesh = shd.make_mesh(data=2, sp=4)
    b, l, n, d = 2, 32, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, l, n, d))
    k = jax.random.normal(ks[1], (b, l, n, d))
    v = jax.random.normal(ks[2], (b, l, n, d))
    ref = _xla_attention(q, k, v, None)
    with jax.set_mesh(mesh):
        spec = NamedSharding(mesh, P("data", "sp", None, None))
        qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
        out = jax.jit(ulysses_attention)(qs, ks_, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_token_parallel_cross_attention(devices8):
    """Token-parallel cross attention (q sequence-sharded, k/v replicated):
    forward AND input gradients match single-device — the shard_map
    transpose must psum the replicated k/v cotangents home."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.ops.attention import (
        _xla_attention, token_parallel_attention,
    )
    from hyvideo_prfl_tpu.parallel import sharding as shd

    mesh = shd.make_mesh(data=2, sp=4)
    b, lq, lk, n, d = 2, 32, 8, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, lq, n, d))
    k = jax.random.normal(ks[1], (b, lk, n, d))
    v = jax.random.normal(ks[2], (b, lk, n, d))

    def loss_ref(q, k, v):
        o = _xla_attention(q, k, v, None)
        return jnp.sum(o * o), o

    (_, ref), ref_grads = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2), has_aux=True)(q, k, v)

    pol = shd.ShardingPolicy()
    with jax.set_mesh(mesh):
        qs = jax.device_put(q, NamedSharding(mesh, P("data", "sp")))
        ks_ = jax.device_put(k, NamedSharding(mesh, P("data")))
        vs = jax.device_put(v, NamedSharding(mesh, P("data")))

        def loss(q, k, v):
            o = token_parallel_attention(q, k, v, pol.tokens)
            return jnp.sum(o * o), o

        (_, out), grads = jax.jit(jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True))(qs, ks_, vs)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    for g, gr, name in zip(grads, ref_grads, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name} mismatch (replicated-cotangent psum?)")


def test_token_parallel_cross_attention_bnld(devices8):
    """Head-major q/k layout (the fused qknorm output) through the
    token-parallel path."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.ops.attention import (
        _xla_attention, token_parallel_attention,
    )
    from hyvideo_prfl_tpu.parallel import sharding as shd

    mesh = shd.make_mesh(data=2, sp=4)
    b, lq, lk, n, d = 2, 32, 8, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, n, lq, d))
    k = jax.random.normal(ks[1], (b, n, lk, d))
    v = jax.random.normal(ks[2], (b, lk, n, d))
    ref = _xla_attention(q, k, v, None, qk_layout="bnld")
    pol = shd.ShardingPolicy()
    with jax.set_mesh(mesh):
        qs = jax.device_put(q, NamedSharding(mesh, P("data", None, "sp")))
        out = jax.jit(lambda q, k, v: token_parallel_attention(
            q, k, v, pol.tokens, qk_layout="bnld"))(qs, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_model_shard_map_ulysses_matches_gspmd(devices8):
    """Full DiT forward: shard_map Ulysses == GSPMD constraints == 1-device."""
    import dataclasses
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.parallel import sharding as shd

    mesh = shd.make_mesh(data=2, sp=4)
    cfg = wan_dit.tiny_test(remat=False, num_heads=4)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    b, f, h, w = 2, 8, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, cfg.text_len, cfg.text_dim)) * 0.1
    t = jnp.asarray([500.0, 100.0])
    ref = wan_dit.WanModel(cfg).apply(
        params, x, t, ctx, output_features=True, selected_layers=(2,))
    pol = shd.ShardingPolicy(shard_map_ulysses=True)
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "sp")))
        cs = jax.device_put(ctx, NamedSharding(mesh, P("data")))
        m = wan_dit.WanModel(cfg, pol)
        out = jax.jit(lambda p, x, t, c: m.apply(
            p, x, t, c, output_features=True, selected_layers=(2,)
        ))(params, xs, t, cs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_teacher_student_mesh(devices8):
    """ts-axis collectives: teacher half broadcasts to student half."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.parallel import teacher_student as ts

    mesh = ts.make_ts_mesh(data=2, sp=2)
    assert mesh.axis_names == ("ts", "data", "sp")
    # value differs per ts half: student half zeros, teacher half ones
    x = jnp.concatenate([jnp.zeros((1, 4)), jnp.ones((1, 4))], axis=0)
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("ts", None)))

        def inner(x):
            return ts.broadcast_from_teacher(x)

        out = jax.jit(jax.shard_map(
            inner, mesh=jax.sharding.get_abstract_mesh(),
            in_specs=P("ts", None), out_specs=P("ts", None),
        ))(xs)
    np.testing.assert_array_equal(np.asarray(out), 1.0)  # all got teacher's


def test_ring_attention_matches_full(devices8):
    """K/V ring rotation + online-softmax merge == full attention."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.ops.attention import _xla_attention
    from hyvideo_prfl_tpu.ops.ring_attention import ring_attention
    from hyvideo_prfl_tpu.parallel import sharding as shd

    mesh = shd.make_mesh(data=2, sp=4)
    b, l, n, d = 2, 64, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, l, n, d))
    k = jax.random.normal(ks[1], (b, l, n, d))
    v = jax.random.normal(ks[2], (b, l, n, d))
    ref = _xla_attention(q, k, v, None)
    with jax.set_mesh(mesh):
        spec = NamedSharding(mesh, P("data", "sp", None, None))
        out = jax.jit(ring_attention)(
            jax.device_put(q, spec), jax.device_put(k, spec),
            jax.device_put(v, spec))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_ring_attention_backward_matches_full(devices8):
    """Training-grade ring: the custom-VJP ring backward (rotating dK/dV
    partials, local dQ) equals full-attention gradients for q, k AND v."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.ops.attention import _xla_attention
    from hyvideo_prfl_tpu.ops.ring_attention import ring_attention
    from hyvideo_prfl_tpu.parallel import sharding as shd

    mesh = shd.make_mesh(data=2, sp=4)
    b, l, n, d = 2, 64, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (b, l, n, d))
    k = jax.random.normal(ks[1], (b, l, n, d))
    v = jax.random.normal(ks[2], (b, l, n, d))
    w = jax.random.normal(ks[3], (b, l, n, d))  # non-uniform cotangent

    ref_grads = jax.grad(
        lambda q, k, v: jnp.sum(_xla_attention(q, k, v, None) * w),
        argnums=(0, 1, 2))(q, k, v)
    with jax.set_mesh(mesh):
        spec = NamedSharding(mesh, P("data", "sp", None, None))
        qs, ks_, vs, ws = (jax.device_put(x, spec) for x in (q, k, v, w))
        grads = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(ring_attention(q, k, v) * ws),
            argnums=(0, 1, 2)))(qs, ks_, vs)
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_usp_attention_backward_matches_full(devices8):
    """USP (ring x ulysses) gradients: all_to_all head swap + ring backward
    == full-attention gradients."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hyvideo_prfl_tpu.ops.attention import _xla_attention
    from hyvideo_prfl_tpu.ops.ring_attention import usp_attention
    from hyvideo_prfl_tpu.parallel import sharding as shd

    mesh = shd.make_usp_mesh(data=2, ring=2, ulysses=2)
    b, l, n, d = 2, 64, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    q = jax.random.normal(ks[0], (b, l, n, d))
    k = jax.random.normal(ks[1], (b, l, n, d))
    v = jax.random.normal(ks[2], (b, l, n, d))
    w = jax.random.normal(ks[3], (b, l, n, d))

    ref_grads = jax.grad(
        lambda q, k, v: jnp.sum(_xla_attention(q, k, v, None) * w),
        argnums=(0, 1, 2))(q, k, v)
    with jax.set_mesh(mesh):
        spec = NamedSharding(mesh, P("data", ("ring", "sp"), None, None))
        qs, ks_, vs, ws = (jax.device_put(x, spec) for x in (q, k, v, w))
        grads = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(usp_attention(q, k, v) * ws),
            argnums=(0, 1, 2)))(qs, ks_, vs)
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_eval_prompt_dataset(tmp_path):
    import json as _json
    from hyvideo_prfl_tpu.data.dataset import EvalPromptDataset
    txt = tmp_path / "prompts.txt"
    txt.write_text("a cat\n\na dog\n")
    ds = EvalPromptDataset(str(txt))
    assert len(ds) == 2 and ds[0]["prompt"] == "a cat"
    jsn = tmp_path / "prompts.json"
    jsn.write_text(_json.dumps([{"prompt": "x"}, {"caption": "y"}]))
    ds2 = EvalPromptDataset(str(jsn))
    assert ds2[1]["prompt"] == "y"


def test_train_reward_mlp_standalone():
    from hyvideo_prfl_tpu.models.reward import train_reward_mlp
    rng = np.random.RandomState(0)
    feats = np.concatenate([rng.randn(64, 16) + 2, rng.randn(64, 16) - 2])
    labels = np.concatenate([np.ones(64), np.zeros(64)])
    params, hist = train_reward_mlp(feats, labels, epochs=20, lr=3e-3,
                                    batch_size=32)
    assert hist["val_accuracy"] >= 0.9, hist


def test_prompt_expander_full_surface():
    """Reference surface parity (prompt_extend.py): system-prompt dispatch
    by (tar_lang, is_vl), seed fill-in, add_custom_field, Qwen expander
    graceful failure without weights, VL image resize."""
    import numpy as np
    from hyvideo_prfl_tpu.utils import prompt_extend as pe

    exp = pe.LocalPromptExpander(lambda s, u: u)
    assert exp.decide_system_prompt("zh") == pe.LM_ZH_SYS_PROMPT
    assert exp.decide_system_prompt("en") == pe.LM_EN_SYS_PROMPT
    vl = pe.QwenPromptExpander(is_vl=True)
    assert vl.decide_system_prompt("zh") == pe.VL_ZH_SYS_PROMPT
    assert vl.decide_system_prompt("en") == pe.VL_EN_SYS_PROMPT
    assert vl.model_name == "Qwen/Qwen2-VL-7B-Instruct"
    assert pe.QwenPromptExpander().model_name == "Qwen/Qwen2.5-7B-Instruct"

    out = exp("hi", tar_lang="en")
    assert out.status and out.seed >= 0  # random seed filled in
    out.add_custom_field("extra", 3)
    assert out.extra == 3

    # local Qwen without weights/network: degrade, don't crash
    q = pe.QwenPromptExpander(model_name="/nonexistent/qwen")
    bad = q("a cat runs", tar_lang="en")
    assert not bad.status and bad.prompt == "a cat runs"

    # VL resize: area-capped, aspect preserved
    from PIL import Image

    img = Image.fromarray(np.zeros((400, 800, 3), np.uint8))
    small = pe._resize_for_vl(img, max_image_size=128 * 128)
    assert small.width * small.height <= 128 * 128 + 256
    assert abs(small.width / small.height - 2.0) < 0.1


def test_batched_eval_dispatch_count_and_alignment():
    """batched_eval (VERDICT r2 item 5): <= T * ceil(N/B) dispatches, one
    data pass, probs/labels stay aligned across shape buckets + padding."""
    import numpy as np

    from scripts._common import batched_eval

    class FakeDs:
        def __init__(self):
            # two shape buckets: 5 samples of (2,4,4,16), 8 of (3,4,4,16)
            self.items = []
            for i in range(5):
                self.items.append({"latents": np.zeros((2, 4, 4, 16)),
                                   "text": np.zeros((4, 8)),
                                   "labels": float(i % 2)})
            for i in range(8):
                self.items.append({"latents": np.zeros((3, 4, 4, 16)),
                                   "text": np.zeros((4, 8)),
                                   "labels": float((i + 1) % 2)})

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    calls = []

    def fake_eval(trainable, frozen, batch, t, seed):
        calls.append(batch["latents"].shape)
        # prob encodes the batch row index so alignment is checkable
        return np.arange(batch["latents"].shape[0], dtype=np.float32)

    ds = FakeDs()
    out = batched_eval(fake_eval, {}, {}, ds, [100.0, 500.0], seed=0,
                       batch_size=4)
    # buckets: 5 -> ceil(5/4)=2 batches; 8 -> 2 batches; x2 timesteps = 8
    assert len(calls) == 8
    probs, labels = out[100.0]
    assert len(probs) == len(ds) and len(labels) == len(ds)
    # padded rows must be dropped: bucket of 5 contributes probs 0..3,0
    assert probs[:5] == [0.0, 1.0, 2.0, 3.0, 0.0]
    assert labels == [float(i % 2) for i in range(5)] + \
        [float((i + 1) % 2) for i in range(8)]


def test_vision_io_fetch_and_smart_resize(tmp_path):
    """qwen_vl_utils parity (utils/vision_io.py): smart_resize factor/pixel
    contract + fetch_image across reference kinds (path, file://, data:
    base64, numpy, PIL)."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    from hyvideo_prfl_tpu.utils import vision_io as vio

    # smart_resize: factor-28 multiples within pixel bounds, aspect kept
    h, w = vio.smart_resize(481, 833)
    assert h % 28 == 0 and w % 28 == 0
    assert vio.MIN_PIXELS <= h * w <= vio.MAX_PIXELS
    assert abs((h / w) - (481 / 833)) < 0.1
    # max_pixels clamp
    h, w = vio.smart_resize(4000, 4000, max_pixels=1000 * 28 * 28)
    assert h * w <= 1000 * 28 * 28
    # min_pixels raise
    h, w = vio.smart_resize(10, 10)
    assert h * w >= vio.MIN_PIXELS
    try:
        vio.smart_resize(28, 28 * 300)
        raised = False
    except ValueError:
        raised = True
    assert raised

    img = Image.fromarray(
        (np.random.RandomState(0).rand(50, 70, 3) * 255).astype("uint8"))
    p = tmp_path / "x.png"
    img.save(p)
    for ref in (img, str(p), f"file://{p}",
                np.asarray(img),
                np.asarray(img, np.float32) / 127.5 - 1.0):
        out = vio.fetch_image(ref)
        assert out.mode == "RGB"
        assert out.width % 28 == 0 and out.height % 28 == 0
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    out = vio.fetch_image(uri)
    assert out.mode == "RGB"
    # resize=False keeps original dims (prompt_extend loading path)
    out = vio.fetch_image(str(p), resize=False)
    assert (out.width, out.height) == (70, 50)
