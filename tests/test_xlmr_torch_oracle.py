"""XLM-RoBERTa text tower (+ CLIP projection head) parity vs an
independent torch oracle, and full-CLIP-checkpoint converter roundtrip.

fp64 PyTorch reimplementation of the reference math
(/root/reference/diffusers_lite/wan/modules/xlm_roberta.py: RoBERTa-style
position ids pad_id + cumsum(mask) * mask, post-norm blocks with scaled
attention, exact GELU; head per clip.py:304-327) against OUR params
exported through `xlmr_flax_to_torch`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hyvideo_prfl_tpu.models import clip as cm  # noqa: E402
from hyvideo_prfl_tpu.models import xlm_roberta as xm  # noqa: E402
from hyvideo_prfl_tpu.utils import convert_encoders as ce  # noqa: E402


def _w(state, key):
    return torch.from_numpy(np.ascontiguousarray(state[key])).double()


def _ln(x, state, pfx, eps):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), _w(state, pfx + ".weight"),
        _w(state, pfx + ".bias"), eps)


def _oracle_xlmr_with_head(state, cfg, ids):
    ids_t = torch.from_numpy(ids).long()
    b, l = ids_t.shape
    n = cfg.num_heads
    hd = cfg.dim // n
    mask = (ids_t != cfg.pad_id).long()
    pos_ids = cfg.pad_id + torch.cumsum(mask, dim=1) * mask
    x = _w(state, "textual.token_embedding.weight")[ids_t] \
        + _w(state, "textual.type_embedding.weight")[torch.zeros_like(ids_t)] \
        + _w(state, "textual.pos_embedding.weight")[pos_ids]
    x = _ln(x, state, "textual.norm", cfg.eps)
    add_mask = torch.where(mask.view(b, 1, 1, l) > 0,
                           torch.tensor(0.0).double(),
                           torch.tensor(torch.finfo(torch.float32).min
                                        ).double())
    for i in range(cfg.num_layers):
        p = f"textual.blocks.{i}."
        q = (x @ _w(state, p + "attn.q.weight").T
             + _w(state, p + "attn.q.bias")).view(b, l, n, hd)
        k = (x @ _w(state, p + "attn.k.weight").T
             + _w(state, p + "attn.k.bias")).view(b, l, n, hd)
        v = (x @ _w(state, p + "attn.v.weight").T
             + _w(state, p + "attn.v.bias")).view(b, l, n, hd)
        logits = torch.einsum("bqnd,bknd->bnqk", q, k) / (hd ** 0.5)
        probs = (logits + add_mask).softmax(-1)
        o = torch.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, l, cfg.dim)
        o = o @ _w(state, p + "attn.o.weight").T + _w(state, p + "attn.o.bias")
        x = _ln(x + o, state, p + "norm1", cfg.eps)  # post-norm
        h = x @ _w(state, p + "ffn.0.weight").T + _w(state, p + "ffn.0.bias")
        h = torch.nn.functional.gelu(h)
        h = h @ _w(state, p + "ffn.2.weight").T + _w(state, p + "ffn.2.bias")
        x = _ln(x + h, state, p + "norm2", cfg.eps)
    m = mask.double().unsqueeze(-1)
    pooled = (x * m).sum(1) / m.sum(1)
    h = torch.nn.functional.gelu(pooled @ _w(state, "textual.head.0.weight").T)
    return (h @ _w(state, "textual.head.2.weight").T).numpy()


def _fabricate_tree(cfg, out_dim=16, seed=21):
    txt = xm.XLMRoberta(cfg).init(jax.random.PRNGKey(seed),
                                  jnp.ones((1, 8), jnp.int32))
    mid = (cfg.dim + out_dim) // 2
    rng = np.random.RandomState(seed)
    return {"params": jax.device_get(txt)["params"],
            "head": {"h0": rng.randn(cfg.dim, mid).astype(np.float32) * 0.1,
                     "h2": rng.randn(mid, out_dim).astype(np.float32) * 0.1}}


def test_xlmr_with_head_matches_torch_oracle():
    cfg = xm.tiny_xlmr()
    tree = _fabricate_tree(cfg)
    state = ce.xlmr_flax_to_torch(tree, cfg)
    # pad_id = 1: row 0 has padding, row 1 is full
    ids = np.array([[5, 9, 33, 2, 1, 1, 1, 1],
                    [7, 8, 9, 10, 11, 12, 13, 14]], np.int32)
    ours = np.asarray(xm.encode_with_head(tree, cfg, jnp.asarray(ids)))
    oracle = _oracle_xlmr_with_head(state, cfg, ids)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)


def test_clip_full_checkpoint_roundtrip():
    """visual + textual + head + log_scale through the combined converters
    (the released open-clip pth surface, clip.py:329-405)."""
    vis_cfg = cm.tiny_clip()
    txt_cfg = xm.tiny_xlmr()
    tree = {
        "visual": jax.device_get(
            cm.init_clip_params(vis_cfg, jax.random.PRNGKey(8))),
        "textual": _fabricate_tree(txt_cfg),
        "log_scale": np.float32(2.6593),
    }
    state = ce.clip_full_flax_to_torch(tree, vis_cfg, txt_cfg)
    assert "log_scale" in state and "textual.head.0.weight" in state
    back = ce.clip_full_torch_to_flax(state, vis_cfg, txt_cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(tree)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        other = flat_b[jax.tree_util.keystr(path)]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(other),
                                      err_msg=jax.tree_util.keystr(path))
