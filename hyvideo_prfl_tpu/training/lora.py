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


def _qk_perms(head_dim: int, dim: int):
    """(perm, inv_perm) over the flattened q/k output dim between the
    reference adjacent-pair rope layout and our half layout
    (utils/checkpoint.py _rope_perm_full)."""
    import numpy as np

    from ..models.rope import rope_permutation

    per_head = rope_permutation(head_dim)
    inv = np.empty_like(per_head)
    inv[per_head] = np.arange(head_dim)
    n_heads = dim // head_dim
    perm = np.concatenate([per_head + h * head_dim
                           for h in range(n_heads)])
    inv_perm = np.concatenate([inv + h * head_dim for h in range(n_heads)])
    return perm, inv_perm


def lora_state_dict(lora: Dict, fmt: str = "transformer",
                    head_dim: int = None) -> Dict:
    """Flat torch-style key export (model_utils.py:17-67). Formats:
    transformer (blocks.N.attn.m.lora_A.weight), kohya, diffusers.

    head_dim: when given, self_attn q/k B factors are un-permuted from our
    rope half layout back to the reference adjacent-pair layout (see
    models/rope.py rope_permutation) so the export is numerically valid for
    reference-side consumption: delta columns must match the base q/k
    weight layout the reference stores."""
    import numpy as np

    out = {}
    for attn, mods in lora["lora"].items():
        for m, ab in mods.items():
            a = np.asarray(ab["A"])  # [L, in, r]
            b = np.asarray(ab["B"])  # [L, r, out] (our layout)
            if head_dim is not None and attn == "self_attn" and m in ("q", "k"):
                _, inv_perm = _qk_perms(head_dim, b.shape[-1])
                # b[:, :, j] feeds our out column j == reference column
                # perm[j]; reorder so column o holds the reference slot o
                b = b[:, :, inv_perm]
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


def lora_from_state_dict(state: Dict, head_dim: int = None) -> Dict:
    """Import a reference-format LoRA state dict (any of the three export
    formats, load_lora_state_dict key remap in diffusion_utils.py:152-309)
    into our stacked low-rank tree, permuting self_attn q/k B factors into
    the rope half layout."""
    import re

    import numpy as np

    pat = re.compile(
        r"(?:transformer\.)?blocks[._](\d+)[._](self_attn|cross_attn)[._]"
        r"(q|k|v|o)\.(?:lora_A|lora_down|lora_B|lora_up)\.weight$"
    )
    per_layer: Dict = {}
    for key, val in state.items():
        kk = key.replace("lora_unet_blocks_", "blocks.")
        m = pat.search(kk)
        if not m:
            continue
        i, attn, mod = int(m.group(1)), m.group(2), m.group(3)
        which = "A" if ("lora_A" in key or "lora_down" in key) else "B"
        per_layer.setdefault((attn, mod), {}).setdefault(which, {})[i] = (
            np.asarray(val))

    out: Dict = {}
    for (attn, mod), ab in sorted(per_layer.items()):
        n = max(ab["A"]) + 1
        a = np.stack([np.transpose(ab["A"][i]) for i in range(n)])  # [L,in,r]
        b = np.stack([np.transpose(ab["B"][i]) for i in range(n)])  # [L,r,out]
        if head_dim is not None and attn == "self_attn" and mod in ("q", "k"):
            perm, _ = _qk_perms(head_dim, b.shape[-1])
            b = b[:, :, perm]
        out.setdefault(attn, {})[mod] = {"A": jnp.asarray(a),
                                         "B": jnp.asarray(b)}
    return {"lora": out}
