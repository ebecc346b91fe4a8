"""PAVRM latent reward heads + objectives.

Parity target: reference `diffusers_lite/utils/network.py` (QueryAttention,
MLP, forward_mlp, forward_siamese) and the loss assembly in
`scripts/pavrm/train_pavrm.py:796-869` / `scripts/prfl/train_prfl.py:767-798`.

The heads score DiT feature taps (noisy-latent features) — no VAE decode, no
VLM — which is the paper's core efficiency trick (SURVEY.md 5.7).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class QueryAttention(nn.Module):
    """Learnable-query attention pooling over DiT features
    (network.py:8-110). Multi-head attention with `num_queries` learned
    query vectors; queries attend over the [B, L, D] feature sequence.

    Differences from the reference, both deliberate:
    * `return_type='query'` adds the (squeezed) query to the pooled output
      with sane [B, D] broadcasting; the reference's `output + queries`
      (network.py:104) broadcasts [B,D]+[B,1,D] which is only well-formed
      at batch size 1 (the shipped configs' setting).
    * Dropout is omitted (every shipped config sets dropout 0).
    """

    feature_dim: int
    num_queries: int = 1
    num_heads: int = 8
    layer_norm: bool = False
    return_type: Optional[str] = None
    product_text: bool = False
    text_dim: int = 768

    @nn.compact
    def __call__(self, x, text=None):
        d = self.feature_dim
        nh = self.num_heads
        hd = d // nh
        x = x.astype(jnp.float32)

        if self.layer_norm:
            x = _fp32_layernorm(x)

        b, l, _ = x.shape
        queries = self.param(
            "queries", nn.initializers.xavier_uniform(), (self.num_queries, d)
        )
        q_in = jnp.broadcast_to(queries[None], (b, self.num_queries, d))

        # torch nn.MultiheadAttention equivalent: fused in-proj + out-proj
        wq = self.param("wq", nn.initializers.xavier_uniform(), (d, d))
        wk = self.param("wk", nn.initializers.xavier_uniform(), (d, d))
        wv = self.param("wv", nn.initializers.xavier_uniform(), (d, d))
        bq = self.param("bq", nn.initializers.zeros, (d,))
        bk = self.param("bk", nn.initializers.zeros, (d,))
        bv = self.param("bv", nn.initializers.zeros, (d,))
        wo = self.param("wo", nn.initializers.xavier_uniform(), (d, d))
        bo = self.param("bo", nn.initializers.zeros, (d,))

        q = (q_in @ wq + bq).reshape(b, self.num_queries, nh, hd)
        k = (x @ wk + bk).reshape(b, l, nh, hd)
        v = (x @ wv + bv).reshape(b, l, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1)
        attended = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(
            b, self.num_queries, d
        )
        attended = attended @ wo + bo

        if self.num_queries > 1:
            out = attended.mean(axis=1)
        else:
            out = attended[:, 0]

        if self.layer_norm:
            out = _fp32_layernorm(out)

        if self.return_type == "query":
            out = out + jnp.broadcast_to(queries.mean(axis=0)[None], out.shape)

        if self.product_text and text is not None:
            proj = nn.Dense(
                d, name="text_proj",
                kernel_init=nn.initializers.xavier_uniform(),
            )(text.astype(jnp.float32))
            return proj * out
        return out


def _fp32_layernorm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps)


class RewardMLP(nn.Module):
    """3-layer reward scalar head d -> 1024 -> 512 -> 1 (network.py:112-134).
    No sigmoid here — objectives apply it (network.py:133)."""

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        x = nn.relu(nn.Dense(1024, kernel_init=nn.initializers.xavier_uniform())(x))
        x = nn.relu(nn.Dense(512, kernel_init=nn.initializers.xavier_uniform())(x))
        return nn.Dense(1, kernel_init=nn.initializers.xavier_uniform())(x)


class MultiHeadReward(nn.Module):
    """num_heads independent RewardMLPs (network.py:136-149)."""

    num_heads: int = 3

    @nn.compact
    def __call__(self, x):
        return jnp.stack([RewardMLP(name=f"mlp_{i}")(x) for i in range(self.num_heads)])


def reward_sigmoid(logits: jnp.ndarray) -> jnp.ndarray:
    """forward_mlp: sigmoid(r) (network.py:151-152)."""
    return jax.nn.sigmoid(logits)


def siamese_prob(r_win: jnp.ndarray, r_lose: jnp.ndarray) -> jnp.ndarray:
    """Bradley-Terry preference prob sigmoid(r_win - r_lose)
    (network.py:154-162)."""
    return jax.nn.sigmoid(r_win - r_lose)


def bce_loss(probs: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Binary cross entropy on probabilities (torch BCELoss semantics)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))


def prfl_hinge_loss(reward_scores: jnp.ndarray, target_reward: float = 2.0,
                    scale: float = 0.1) -> jnp.ndarray:
    """PRFL objective 0.1 * relu(target - sigmoid(r)).mean()
    (train_prfl.py:796-798)."""
    return scale * jnp.mean(nn.relu(target_reward - reward_scores))


def pool_features(features: jnp.ndarray, method: str,
                  q_attn_apply=None) -> jnp.ndarray:
    """Pool stacked feature taps [n_sel, B, L, D] -> [B, D].

    method: 'q_attn' | 'mean' | 'max' (train_pavrm.py:796-813). Multiple taps
    are pooled independently then averaged (the reference's sp-dim averaging
    generalized to the tap axis)."""
    n_sel, b, l, d = features.shape
    if method == "q_attn":
        assert q_attn_apply is not None
        pooled = jax.vmap(q_attn_apply)(features)  # [n_sel, B, D]
    elif method == "mean":
        pooled = features.mean(axis=2)
    elif method == "max":
        pooled = features.max(axis=2)
    else:
        raise ValueError(f"unknown pool {method}")
    return pooled.mean(axis=0)


def train_reward_mlp(features, labels, mode: str = "clf", epochs: int = 3,
                     lr: float = 1e-3, batch_size: int = 512, seed: int = 0,
                     val_split: float = 0.2, patience: int = 3,
                     verbose: bool = False):
    """Standalone offline reward-MLP trainer over precomputed features
    (network.py:164-214 train_model): random minibatches, BCE, simple
    early stopping on a held-out split. mode "clf" (pointwise) or
    "siamese" (features [N, 2, D] win/lose pairs).

    Returns (params, history dict).
    """
    import numpy as np
    import optax

    features = jnp.asarray(features, jnp.float32)
    labels = jnp.asarray(labels, jnp.float32)
    n = features.shape[0]
    n_val = max(1, int(n * val_split))
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    tr, va = perm[n_val:], perm[:n_val]
    x_tr, y_tr = features[tr], labels[tr]
    x_va, y_va = features[va], labels[va]

    mlp = RewardMLP()
    d = features.shape[-1]
    params = mlp.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, d)))
    tx = optax.adam(lr)
    opt = tx.init(params)

    def fwd(p, x):
        if mode == "siamese":
            return siamese_prob(mlp.apply(p, x[:, 0]), mlp.apply(p, x[:, 1]))
        return reward_sigmoid(mlp.apply(p, x))

    @jax.jit
    def step(p, opt, x, y):
        def loss_fn(p):
            return bce_loss(fwd(p, x)[:, 0], y)
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), opt, loss

    bs = min(batch_size, x_tr.shape[0])
    val_losses = []
    for epoch in range(epochs):
        for _ in range(max(1, x_tr.shape[0] // bs)):
            idx = rng.permutation(x_tr.shape[0])[:bs]
            params, opt, loss = step(params, opt, x_tr[idx], y_tr[idx])
        val_loss = float(bce_loss(fwd(params, x_va)[:, 0], y_va))
        val_losses.append(val_loss)
        if verbose:
            print(f"epoch {epoch}: train {float(loss):.4f} val {val_loss:.4f}")
        if (len(val_losses) > patience
                and all(val_losses[-1] > v
                        for v in val_losses[-(patience + 1):-1])):
            break
    acc = float(jnp.mean(((fwd(params, x_va)[:, 0] > 0.5)
                          == (y_va > 0.5)).astype(jnp.float32)))
    return params, {"val_losses": val_losses, "val_accuracy": acc}
