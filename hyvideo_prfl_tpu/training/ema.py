"""EMA of parameters (model_utils.py:171-175, config model.ema)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(jnp.array, params)


def ema_update(ema_params, params, decay: float = 0.99):
    """ema = decay * ema + (1 - decay) * params."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params,
    )
