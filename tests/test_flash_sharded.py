"""Flash attention under multi-chip GSPMD/Shardy (ops/flash_sharded.py).

Reference behavior matched: flash attention runs in EVERY attention,
including multi-GPU runs (`wan/modules/attention.py:24-130`). Round 1's
auto backend fell back to XLA einsum attention on multi-chip meshes; these
tests pin the custom_partitioning path: numerics equal to the XLA oracle,
and the partitionable custom-call present in the lowered multi-chip DiT
fwd+bwd. On the CPU test mesh the Pallas kernels run in interpret mode
(numerically identical); on TPU the same code path emits Mosaic kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.ops import attention as att
from hyvideo_prfl_tpu.ops.attention import _xla_attention
from hyvideo_prfl_tpu.ops.flash_sharded import flash_attention_sharded
from hyvideo_prfl_tpu.parallel.sharding import ShardingPolicy


@pytest.fixture()
def mesh24(devices8):
    return Mesh(np.asarray(devices8).reshape(2, 4), ("data", "sp"))


def _qkv(b=2, l=256, n=4, d=128, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (b, l, n, d), dtype) for k in ks)


def test_sharded_flash_matches_xla_fwd_bwd(mesh24):
    q, k, v = _qkv()
    ref = _xla_attention(q, k, v, None)
    gref = jax.grad(lambda q: (_xla_attention(q, k, v, None) ** 2).sum())(q)
    with jax.set_mesh(mesh24):
        sh = NamedSharding(mesh24, P("data", None, "sp", None))
        qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
        o = jax.jit(flash_attention_sharded)(qs, ks_, vs)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)
        g = jax.jit(jax.grad(
            lambda q: (flash_attention_sharded(q, ks_, vs) ** 2).sum()))(qs)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=2e-5)


def test_sharded_flash_reshards_token_sharded_inputs(mesh24):
    """Token-sharded operands (the DiT's resident layout) are resharded to
    (batch, heads) by the partitioner — the compiler-inserted Ulysses."""
    q, k, v = _qkv()
    ref = _xla_attention(q, k, v, None)
    with jax.set_mesh(mesh24):
        sh = NamedSharding(mesh24, P("data", "sp", None, None))
        qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
        o = jax.jit(flash_attention_sharded)(qs, ks_, vs)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)


def test_sharded_flash_k_valid_len(mesh24):
    q, k, v = _qkv()
    valid = jnp.asarray([100, 256], jnp.int32)
    ref = _xla_attention(q, k, v, valid)
    with jax.set_mesh(mesh24):
        sh = NamedSharding(mesh24, P("data", None, "sp", None))
        qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
        o = jax.jit(flash_attention_sharded)(qs, ks_, vs, valid)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)


def test_multichip_dit_fwd_bwd_runs_flash(mesh24):
    """The compiled multi-chip DiT fwd+bwd contains the partitionable flash
    custom-call and matches single-device numerics (VERDICT round-1 item 3;
    reference runs flash in every attention, attention.py:24-130)."""
    # head_dim 128 (flash contract); fp32 compute so the flash-vs-einsum
    # comparison isn't swamped by bf16 rounding
    cfg = wan_dit.tiny_test(remat=False, dim=256, num_heads=2,
                            ffn_dim=512, compute_dtype=jnp.float32)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), hk.shape) * 0.02)
    b, f, h, w = 2, 4, 16, 16  # 4*8*8 = 256 tokens
    x = jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 16))
    t = jnp.full((b,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, cfg.text_len, cfg.text_dim)) * 0.1

    model_1dev = wan_dit.WanModel(cfg)

    def loss_1dev(params, x):
        return (model_1dev.apply(params, x, t, ctx) ** 2).mean()

    l_ref, g_ref = jax.value_and_grad(loss_1dev)(params, x)

    policy = ShardingPolicy()
    model = wan_dit.WanModel(cfg, policy)

    def loss(params, x):
        return (model.apply(params, x, t, ctx) ** 2).mean()

    att.set_default_backend("flash")  # CPU auto would pick xla; force
    try:
        with jax.set_mesh(mesh24):
            xs = jax.device_put(
                x, NamedSharding(mesh24, P("data", None, None, "sp")))
            step = jax.jit(jax.value_and_grad(loss))
            txt = step.lower(params, xs).as_text()
            assert "CustomSPMDPartitioning" in txt, (
                "flash custom_partitioning call absent from multi-chip DiT")
            l, g = step(params, xs)
    finally:
        att.set_default_backend("auto")
    np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-5)
    gd = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max() / (jnp.abs(b_).max() + 1e-8)),
        g, g_ref)
    assert max(jax.tree.leaves(gd)) < 1e-4, f"grad mismatch: {gd}"
