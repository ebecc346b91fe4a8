"""LoRA as explicit low-rank parameter trees.

Parity target: the reference's peft-based LoRA on q/k/v/o
(model.lora config, train_prfl.py:320-333) and merge-into-weights loading
(utils/diffusion_utils.py:152-309, model_utils.py:17-67 kohya/diffusers
export formats).

TPU-native design: instead of monkey-patched Linear modules, LoRA lives as
a separate pytree {blocks: {self_attn: {q: {A [L, in, r], B [L, r, out]}}}}
and `apply_lora` produces merged params (kernel + scale * A @ B) inside the
jitted loss — differentiable w.r.t. (A, B) only, while the base stays
frozen. Merging costs a few small matmuls per step and keeps the hot path
identical to full fine-tuning.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q", "k", "v", "o")  # configs/train_*.yaml target_modules


def lora_init(rng, params: Dict, rank: int = 128,
              target_modules: Sequence[str] = DEFAULT_TARGETS,
              std: float = 0.01) -> Dict:
    """Low-rank trees for every targeted kernel in blocks.{self,cross}_attn.
    A ~ N(0, std), B = 0 (so the initial delta is zero, peft convention)."""
    blocks = params["params"]["blocks"]
    out = {}
    keys = jax.random.split(rng, 2 * len(target_modules) * 2)
    ki = 0
    for attn in ("self_attn", "cross_attn"):
        if attn not in blocks:
            continue
        sub = {}
        for m in target_modules:
            if m not in blocks[attn]:
                continue
            kern = blocks[attn][m]["kernel"]  # [L, in, out]
            l, din, dout = kern.shape
            sub[m] = {
                "A": jax.random.normal(keys[ki], (l, din, rank)) * std,
                "B": jnp.zeros((l, rank, dout), kern.dtype),
            }
            ki += 1
        out[attn] = sub
    return {"lora": out}


def apply_lora(params: Dict, lora: Dict, scale: float = 1.0) -> Dict:
    """Merged params: kernel + scale * A @ B (differentiable in A, B)."""
    merged = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    blocks = dict(merged["params"]["blocks"])
    for attn, mods in lora["lora"].items():
        attn_tree = dict(blocks[attn])
        for m, ab in mods.items():
            node = dict(attn_tree[m])
            delta = jnp.einsum(
                "lir,lro->lio", ab["A"].astype(jnp.float32),
                ab["B"].astype(jnp.float32),
            ) * scale
            node["kernel"] = node["kernel"] + delta.astype(node["kernel"].dtype)
            attn_tree[m] = node
        blocks[attn] = attn_tree
    inner = dict(merged["params"])
    inner["blocks"] = blocks
    return {"params": inner}


def lora_state_dict(lora: Dict, fmt: str = "transformer") -> Dict:
    """Flat torch-style key export (model_utils.py:17-67). Formats:
    transformer (blocks.N.attn.m.lora_A.weight), kohya, diffusers."""
    import numpy as np

    out = {}
    for attn, mods in lora["lora"].items():
        for m, ab in mods.items():
            a = np.asarray(ab["A"])  # [L, in, r]
            b = np.asarray(ab["B"])  # [L, r, out]
            for i in range(a.shape[0]):
                if fmt == "transformer":
                    base = f"blocks.{i}.{attn}.{m}"
                    out[f"{base}.lora_A.weight"] = np.transpose(a[i])  # [r, in]
                    out[f"{base}.lora_B.weight"] = np.transpose(b[i])  # [out, r]
                elif fmt == "kohya":
                    base = f"lora_unet_blocks_{i}_{attn}_{m}"
                    out[f"{base}.lora_down.weight"] = np.transpose(a[i])
                    out[f"{base}.lora_up.weight"] = np.transpose(b[i])
                    out[f"{base}.alpha"] = np.asarray(a.shape[-1], np.float32)
                else:  # diffusers
                    base = f"transformer.blocks.{i}.{attn}.{m}"
                    out[f"{base}.lora_A.weight"] = np.transpose(a[i])
                    out[f"{base}.lora_B.weight"] = np.transpose(b[i])
    return out
