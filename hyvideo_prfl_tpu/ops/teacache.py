"""TeaCache: timestep-embedding-gated block skipping for inference.

Parity target: reference `wan/modules/model.py:621-654` +
`wan/distributed/xdit_context_parallel.py:141-174`: between denoising steps,
the relative L1 change of the time-embedding modulation input is rescaled by
a fitted polynomial and accumulated; while the accumulator stays below a
threshold the expensive block stack is skipped and the cached residual
(x_out - x_in) from the last computed step is reused. Forced off in training
(train_prfl.py:316-317); exposed here for inference via `--teacache_thresh`
(arguments.py:170-174).

TPU-native: the decision is a traced scalar; `lax.cond` picks between the
full block stack and the cached-residual add inside one compiled sampling
scan (no python-side step logic).
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp

# fitted rescale polynomials (highest degree first), from the reference
# pipeline init blocks (image2video.py:134-151, text2video.py:120-136)
COEFFICIENTS = {
    "i2v-480p": (-3.02331670e2, 2.23948934e2, -5.25463970e1,
                 5.87348440e0, -2.01973289e-1),
    "i2v-720p": (-114.36346466, 65.26524496, -18.82220707,
                 4.91518089, -0.23412683),
    "t2v-1.3b": (2.39676752e3, -1.31110545e3, 2.01331979e2,
                 -8.29855975e0, 1.37887774e-1),
    "t2v-14b": (-5784.54975374, 5449.50911966, -1811.16591783,
                256.27178429, -13.02252404),
}


@chex.dataclass
class TeaCacheState:
    prev_mod_input: jnp.ndarray  # [B, dim] previous time-embed e
    accum: jnp.ndarray  # scalar accumulated rescaled rel-L1
    residual: jnp.ndarray  # [B, L, D] cached block-stack residual
    have_prev: jnp.ndarray  # bool scalar


def init_state(batch: int, dim: int, seq_len: int) -> TeaCacheState:
    return TeaCacheState(
        prev_mod_input=jnp.zeros((batch, dim), jnp.float32),
        accum=jnp.zeros((), jnp.float32),
        residual=jnp.zeros((batch, seq_len, dim), jnp.float32),
        have_prev=jnp.zeros((), bool),
    )


def _poly(coeffs, x):
    y = jnp.zeros_like(x)
    for c in coeffs:
        y = y * x + c
    return y


def should_skip(state: TeaCacheState, mod_input: jnp.ndarray,
                step_index: jnp.ndarray, num_steps: int,
                thresh: float, coeffs) -> Tuple[jnp.ndarray, TeaCacheState]:
    """Returns (skip?, updated accumulator state). Mirrors model.py:625-639:
    first and last steps always compute; otherwise accumulate
    poly(rel_l1(e, prev_e)) and skip while below the threshold."""
    rel = (jnp.abs(mod_input - state.prev_mod_input).mean()
           / jnp.maximum(jnp.abs(state.prev_mod_input).mean(), 1e-8))
    accum = state.accum + _poly(coeffs, rel)
    forced = (step_index == 0) | (step_index == num_steps - 1) | (
        ~state.have_prev)
    skip = (~forced) & (accum < thresh)
    # on compute, the accumulator resets (model.py:635-636)
    new_accum = jnp.where(skip, accum, 0.0)
    new_state = TeaCacheState(
        prev_mod_input=mod_input.astype(jnp.float32),
        accum=new_accum,
        residual=state.residual,
        have_prev=jnp.ones((), bool),
    )
    return skip, new_state
