"""T5 encoder parity vs an independent torch oracle.

Minimal fp64 PyTorch reimplementation of the reference umT5 encoder math
(/root/reference/diffusers_lite/wan/modules/t5.py: T5 RMS norm, unscaled
attention logits, per-layer bidirectional relative-position buckets,
GEGLU feed-forward with the tanh GELU) — written fresh for this test, no
transformers/reference imports — loading OUR params exported through
`t5_flax_to_torch` (the reference on-disk format). Validates the encoder
math AND the converter key mapping numerically in one shot, the same
closure the VAE torch oracle provides (test_vae_torch_oracle.py).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hyvideo_prfl_tpu.models import t5 as t5m  # noqa: E402
from hyvideo_prfl_tpu.utils import convert_encoders as ce  # noqa: E402


def _w(state, key):
    return torch.from_numpy(np.ascontiguousarray(state[key])).double()


def _rms(x, w, eps=1e-6):
    return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * w


def _buckets(lq, lk, num_buckets=32, max_dist=128):
    rel = torch.arange(lk)[None, :] - torch.arange(lq)[:, None]
    nb = num_buckets // 2
    out = (rel > 0).long() * nb
    rel = rel.abs()
    max_exact = nb // 2
    large = max_exact + (
        torch.log(rel.double().clamp(min=1) / max_exact)
        / math.log(max_dist / max_exact) * (nb - max_exact)).long()
    large = torch.minimum(large, torch.tensor(nb - 1))
    return out + torch.where(rel < max_exact, rel, large)


def _oracle_t5(state, cfg, ids, mask):
    x = _w(state, "token_embedding.weight")[torch.from_numpy(ids).long()]
    b, l, _ = x.shape
    n = cfg.num_heads
    hd = cfg.dim_attn // n
    m = torch.from_numpy(mask).double()  # [B, L]
    buckets = _buckets(l, l, cfg.num_buckets)
    for i in range(cfg.num_layers):
        p = f"blocks.{i}."
        pos = _w(state, p + "pos_embedding.embedding.weight")  # [NB, N]
        bias = pos[buckets].permute(2, 0, 1)[None]  # [1, N, L, L]
        h = _rms(x, _w(state, p + "norm1.weight"))
        q = (h @ _w(state, p + "attn.q.weight").T).view(b, l, n, hd)
        k = (h @ _w(state, p + "attn.k.weight").T).view(b, l, n, hd)
        v = (h @ _w(state, p + "attn.v.weight").T).view(b, l, n, hd)
        # NO 1/sqrt(d) scaling (T5 convention, reference t5.py:112)
        logits = torch.einsum("binc,bjnc->bnij", q, k) + bias
        logits = torch.where(m[:, None, None, :] > 0, logits,
                             torch.tensor(-1e30).double())
        o = torch.einsum("bnij,bjnc->binc", logits.softmax(-1), v)
        x = x + o.reshape(b, l, cfg.dim_attn) @ _w(state,
                                                   p + "attn.o.weight").T
        h = _rms(x, _w(state, p + "norm2.weight"))
        gate = torch.nn.functional.gelu(
            h @ _w(state, p + "ffn.gate.0.weight").T, approximate="tanh")
        ff = (h @ _w(state, p + "ffn.fc1.weight").T) * gate
        x = x + ff @ _w(state, p + "ffn.fc2.weight").T
    return _rms(x, _w(state, "norm.weight")).numpy()


def test_t5_encoder_matches_torch_oracle():
    cfg = t5m.tiny_t5(compute_dtype=jnp.float32)
    ids = np.array([[3, 17, 256, 999, 42, 0, 0, 0],
                    [7, 1, 2, 3, 4, 5, 6, 8]], np.int32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0],
                     [1, 1, 1, 1, 1, 1, 1, 1]], np.int32)
    params = t5m.T5Encoder(cfg).init(jax.random.PRNGKey(3),
                                     jnp.asarray(ids), jnp.asarray(mask))
    state = ce.t5_flax_to_torch(jax.device_get(params), cfg)

    ours = np.asarray(t5m.encode_text(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask)))
    oracle = _oracle_t5(state, cfg, ids, mask)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=2e-5)
