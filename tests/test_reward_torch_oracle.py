"""Reward heads vs torch oracles.

QueryAttention: the reference pools features with torch's BUILT-IN
nn.MultiheadAttention (/root/reference/diffusers_lite/utils/network.py:
8-110). The strongest oracle is therefore torch's own module, loaded with
our params through `query_attention_flax_to_torch` (the released .ckpt
key surface: queries / multihead_attn.in_proj_* / out_proj.*) — any
converter packing or head-split mismatch shows up numerically.

RewardMLP: fp64 Linear/ReLU chain vs the reference MLP math
(network.py:112-134).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hyvideo_prfl_tpu.models import reward as rw  # noqa: E402
from hyvideo_prfl_tpu.utils import convert_encoders as ce  # noqa: E402


def test_query_attention_matches_torch_multihead_attention():
    d, nh = 64, 8
    qa = rw.QueryAttention(feature_dim=d, num_heads=nh)
    x_np = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 10, d),
                                        jnp.float32))
    params = qa.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    state = ce.query_attention_flax_to_torch(jax.device_get(params))

    mha = torch.nn.MultiheadAttention(d, nh, dropout=0.0, batch_first=True)
    mha = mha.double()
    with torch.no_grad():
        mha.in_proj_weight.copy_(
            torch.from_numpy(state["multihead_attn.in_proj_weight"]))
        mha.in_proj_bias.copy_(
            torch.from_numpy(state["multihead_attn.in_proj_bias"]))
        mha.out_proj.weight.copy_(
            torch.from_numpy(state["multihead_attn.out_proj.weight"]))
        mha.out_proj.bias.copy_(
            torch.from_numpy(state["multihead_attn.out_proj.bias"]))
    queries = torch.from_numpy(np.asarray(state["queries"])).double()
    xt = torch.from_numpy(x_np).double()
    with torch.no_grad():
        attended, _ = mha(queries.unsqueeze(0).expand(2, -1, -1), xt, xt,
                          need_weights=False)
    oracle = attended.squeeze(1).numpy()  # num_queries == 1

    ours = np.asarray(qa.apply(params, jnp.asarray(x_np)))
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)


def test_reward_mlp_matches_torch_oracle():
    mlp = rw.RewardMLP()
    x_np = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4, 96),
                                        jnp.float32))
    params = mlp.init(jax.random.PRNGKey(3), jnp.asarray(x_np))
    state = ce.reward_mlp_flax_to_torch(jax.device_get(params))

    x = torch.from_numpy(x_np).double()
    for i, name in enumerate(("fc1", "fc2", "fc3")):
        w = torch.from_numpy(np.asarray(state[f"{name}.weight"])).double()
        b = torch.from_numpy(np.asarray(state[f"{name}.bias"])).double()
        x = x @ w.T + b
        if i < 2:
            x = torch.relu(x)
    oracle = x.numpy()

    ours = np.asarray(mlp.apply(params, jnp.asarray(x_np)))
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)
