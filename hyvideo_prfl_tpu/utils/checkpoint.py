"""Checkpointing: orbax-native save/resume + safetensors interop with
released PyTorch Wan/PAVRM checkpoints.

Parity target: `diffusers_lite/utils/model_utils.py:38-141` (FSDP
FULL_STATE_DICT -> sharded safetensors + index json; load merges shards)
and the diffusers `WanModel.from_pretrained` layout.

Native path: orbax `StandardCheckpointer` over the sharded param pytree —
the TPU equivalent of FSDP state-dict gathering (arrays are saved with
their shardings; restore re-shards automatically).

Interop path: bidirectional torch<->flax key/layout mapping so released
`diffusion_pytorch_model*.safetensors` load directly, and our checkpoints
can be exported back for reference-side consumption.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan_dit import WanConfig

# ---------------------------------------------------------------------------
# orbax native checkpoints
# ---------------------------------------------------------------------------


def save_orbax(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        # Restore onto the CURRENT backend: a bare restore() replays the
        # shardings recorded at save time, which fails across backends
        # (e.g. a CPU-saved encoder checkpoint loaded on TPU raises
        # "Device TFRT_CPU_0 was not found"). Rebuild the target from the
        # saved metadata with a local single-device sharding instead.
        meta = ckptr.metadata(path).item_metadata
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def to_target(m):
            if hasattr(m, "shape") and hasattr(m, "dtype"):
                return jax.ShapeDtypeStruct(m.shape, m.dtype,
                                            sharding=sharding)
            return m

        return ckptr.restore(path, jax.tree.map(to_target, meta))
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
    return ckptr.restore(path, target)


def load_clip_visual(path: str) -> Any:
    """Load a CLIP vision-tower param tree from orbax, accepting either
    the visual-only tree ({"params": ...}) or the full combined-checkpoint
    tree ({"visual": ..., "textual": ..., "log_scale": ...}) written by
    the clip_full_* converters (utils/convert_encoders.py)."""
    p = load_orbax(path)
    return p["visual"] if isinstance(p, dict) and "visual" in p else p


def parse_resume_step(path: str) -> int:
    """checkpoint-<step>[-ema] -> step (train_prfl.py:183, :333)."""
    m = re.search(r"checkpoint-(\d+)", os.path.basename(os.path.normpath(path)))
    return int(m.group(1)) if m else 0


# ---------------------------------------------------------------------------
# torch <-> flax WanModel conversion
# ---------------------------------------------------------------------------


def _torch_linear(w, b=None):
    """torch Linear weight [out,in] -> flax Dense {kernel [in,out], bias}."""
    out = {"kernel": np.ascontiguousarray(np.transpose(w))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _rope_perm_full(dim: int, head_dim: int, inverse: bool = False) -> np.ndarray:
    """Per-head rope layout permutation over the flattened q/k dim
    (models/rope.py rope_permutation): reference adjacent-pair convention
    <-> our half layout. Applied to q/k projection outputs and their
    RMS-norm scales; attention is invariant since q and k permute together."""
    from ..models.rope import rope_permutation

    per_head = rope_permutation(head_dim)
    if inverse:
        inv = np.empty_like(per_head)
        inv[per_head] = np.arange(head_dim)
        per_head = inv
    n_heads = dim // head_dim
    return np.concatenate([per_head + h * head_dim for h in range(n_heads)])


def torch_state_to_flax(state: Dict[str, np.ndarray], cfg: WanConfig) -> Dict:
    """Convert a reference WanModel state_dict (numpy arrays) to our flax
    param tree. Handles the Conv3d->Dense patch embedding layout and block
    stacking for nn.scan."""
    p: Dict[str, Any] = {}

    w = state["patch_embedding.weight"]  # [dim, in, pt, ph, pw]
    dim = w.shape[0]
    # our patch order is (pt, ph, pw, c): kernel[(t,h,w,c), out]
    k = np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, dim)
    p["patch_embedding"] = {"kernel": np.ascontiguousarray(k),
                            "bias": state["patch_embedding.bias"]}

    p["text_0"] = _torch_linear(state["text_embedding.0.weight"],
                                state["text_embedding.0.bias"])
    p["text_2"] = _torch_linear(state["text_embedding.2.weight"],
                                state["text_embedding.2.bias"])
    p["time_0"] = _torch_linear(state["time_embedding.0.weight"],
                                state["time_embedding.0.bias"])
    p["time_2"] = _torch_linear(state["time_embedding.2.weight"],
                                state["time_embedding.2.bias"])
    p["time_proj"] = _torch_linear(state["time_projection.1.weight"],
                                   state["time_projection.1.bias"])

    n_layers = cfg.num_layers

    def stack(fmt, conv=None):
        arrs = [np.asarray(state[fmt.format(i)]) for i in range(n_layers)]
        a = np.stack(arrs)
        return a if conv is None else conv(a)

    def stack_linear(prefix):
        return {
            "kernel": stack(prefix + ".weight",
                            lambda a: np.ascontiguousarray(
                                np.transpose(a, (0, 2, 1)))),
            "bias": stack(prefix + ".bias"),
        }

    perm = _rope_perm_full(cfg.dim, cfg.head_dim)

    def permute_out(lin):
        return {"kernel": np.ascontiguousarray(lin["kernel"][:, :, perm]),
                "bias": np.ascontiguousarray(lin["bias"][:, perm])}

    blocks: Dict[str, Any] = {
        "modulation": stack("blocks.{}.modulation"),
        "self_attn": {
            # q/k live in our rope half-layout (see models/rope.py)
            "q": permute_out(stack_linear("blocks.{}.self_attn.q")),
            "k": permute_out(stack_linear("blocks.{}.self_attn.k")),
            "v": stack_linear("blocks.{}.self_attn.v"),
            "o": stack_linear("blocks.{}.self_attn.o"),
            "norm_q": stack("blocks.{}.self_attn.norm_q.weight")[:, perm],
            "norm_k": stack("blocks.{}.self_attn.norm_k.weight")[:, perm],
        },
        "cross_attn": {
            "q": stack_linear("blocks.{}.cross_attn.q"),
            "k": stack_linear("blocks.{}.cross_attn.k"),
            "v": stack_linear("blocks.{}.cross_attn.v"),
            "o": stack_linear("blocks.{}.cross_attn.o"),
            "norm_q": stack("blocks.{}.cross_attn.norm_q.weight"),
            "norm_k": stack("blocks.{}.cross_attn.norm_k.weight"),
        },
        "ffn_0": stack_linear("blocks.{}.ffn.0"),
        "ffn_2": stack_linear("blocks.{}.ffn.2"),
    }
    if cfg.cross_attn_norm:
        blocks["norm3_scale"] = stack("blocks.{}.norm3.weight")
        blocks["norm3_bias"] = stack("blocks.{}.norm3.bias")
    if cfg.model_type in ("i2v", "flf2v"):
        blocks["cross_attn"]["k_img"] = stack_linear("blocks.{}.cross_attn.k_img")
        blocks["cross_attn"]["v_img"] = stack_linear("blocks.{}.cross_attn.v_img")
        blocks["cross_attn"]["norm_k_img"] = stack(
            "blocks.{}.cross_attn.norm_k_img.weight")
    p["blocks"] = blocks

    if "head.head.weight" in state:
        p["head"] = {
            "modulation": np.asarray(state["head.modulation"]),
            "head": _torch_linear(state["head.head.weight"],
                                  state["head.head.bias"]),
        }

    if "img_emb.proj.0.weight" in state:
        p["img_emb"] = {
            "ln0_scale": state["img_emb.proj.0.weight"],
            "ln0_bias": state["img_emb.proj.0.bias"],
            "fc1": _torch_linear(state["img_emb.proj.1.weight"],
                                 state["img_emb.proj.1.bias"]),
            "fc2": _torch_linear(state["img_emb.proj.3.weight"],
                                 state["img_emb.proj.3.bias"]),
            "ln1_scale": state["img_emb.proj.4.weight"],
            "ln1_bias": state["img_emb.proj.4.bias"],
        }
        if "img_emb.emb_pos" in state:
            p["img_emb"]["emb_pos"] = np.asarray(state["img_emb.emb_pos"])

    return {"params": jax.tree.map(jnp.asarray, p)}


def flax_to_torch_state(params: Dict, cfg: WanConfig) -> Dict[str, np.ndarray]:
    """Inverse of torch_state_to_flax (for exporting checkpoints)."""
    p = params["params"]
    state: Dict[str, np.ndarray] = {}

    k = np.asarray(p["patch_embedding"]["kernel"])
    pt, ph, pw = cfg.patch_size
    in_dim = k.shape[0] // (pt * ph * pw)
    dim = k.shape[1]
    state["patch_embedding.weight"] = np.ascontiguousarray(
        np.transpose(k.reshape(pt, ph, pw, in_dim, dim), (4, 3, 0, 1, 2))
    )
    state["patch_embedding.bias"] = np.asarray(p["patch_embedding"]["bias"])

    def unlin(dst, node):
        state[dst + ".weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(node["kernel"])))
        state[dst + ".bias"] = np.asarray(node["bias"])

    unlin("text_embedding.0", p["text_0"])
    unlin("text_embedding.2", p["text_2"])
    unlin("time_embedding.0", p["time_0"])
    unlin("time_embedding.2", p["time_2"])
    unlin("time_projection.1", p["time_proj"])

    b = p["blocks"]
    n_layers = np.asarray(b["modulation"]).shape[0]
    inv_perm = _rope_perm_full(cfg.dim, cfg.dim // cfg.num_heads, inverse=True)
    for i in range(n_layers):
        state[f"blocks.{i}.modulation"] = np.asarray(b["modulation"])[i]
        for attn in ("self_attn", "cross_attn"):
            node = b[attn]
            for name in ("q", "k", "v", "o", "k_img", "v_img"):
                if name in node:
                    kern = np.asarray(node[name]["kernel"])[i]
                    bias = np.asarray(node[name]["bias"])[i]
                    if attn == "self_attn" and name in ("q", "k"):
                        kern = kern[:, inv_perm]
                        bias = bias[inv_perm]
                    state[f"blocks.{i}.{attn}.{name}.weight"] = (
                        np.ascontiguousarray(np.transpose(kern)))
                    state[f"blocks.{i}.{attn}.{name}.bias"] = bias
            for name in ("norm_q", "norm_k", "norm_k_img"):
                if name in node:
                    w = np.asarray(node[name])[i]
                    if attn == "self_attn" and name in ("norm_q", "norm_k"):
                        w = w[inv_perm]
                    state[f"blocks.{i}.{attn}.{name}.weight"] = w
        for src, dst in (("ffn_0", "ffn.0"), ("ffn_2", "ffn.2")):
            state[f"blocks.{i}.{dst}.weight"] = np.ascontiguousarray(
                np.transpose(np.asarray(b[src]["kernel"])[i]))
            state[f"blocks.{i}.{dst}.bias"] = np.asarray(b[src]["bias"])[i]
        if "norm3_scale" in b:
            state[f"blocks.{i}.norm3.weight"] = np.asarray(b["norm3_scale"])[i]
            state[f"blocks.{i}.norm3.bias"] = np.asarray(b["norm3_bias"])[i]

    if "head" in p:
        state["head.modulation"] = np.asarray(p["head"]["modulation"])
        unlin("head.head", p["head"]["head"])

    if "img_emb" in p:
        e = p["img_emb"]
        state["img_emb.proj.0.weight"] = np.asarray(e["ln0_scale"])
        state["img_emb.proj.0.bias"] = np.asarray(e["ln0_bias"])
        unlin("img_emb.proj.1", e["fc1"])
        unlin("img_emb.proj.3", e["fc2"])
        state["img_emb.proj.4.weight"] = np.asarray(e["ln1_scale"])
        state["img_emb.proj.4.bias"] = np.asarray(e["ln1_bias"])
        if "emb_pos" in e:
            state["img_emb.emb_pos"] = np.asarray(e["emb_pos"])

    return state


# ---------------------------------------------------------------------------
# safetensors IO (sharded, 5 GB shards + index json like model_utils.py:85-117)
# ---------------------------------------------------------------------------


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Merge all *.safetensors in a dir (load_state_dict,
    model_utils.py:127-141)."""
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return state


def save_safetensors_sharded(state: Dict[str, np.ndarray], path: str,
                             max_shard_bytes: int = 5 * 1024 ** 3,
                             prefix: str = "diffusion_pytorch_model") -> None:
    """Write 5 GB-sharded safetensors + index json (model_utils.py:85-117)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    shards, cur, cur_bytes = [], {}, 0
    for k, v in state.items():
        sz = v.nbytes
        if cur and cur_bytes + sz > max_shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += sz
    if cur:
        shards.append(cur)

    if len(shards) == 1:
        save_file(shards[0], os.path.join(path, f"{prefix}.safetensors"))
        return
    index = {"metadata": {"total_size": sum(v.nbytes for v in state.values())},
             "weight_map": {}}
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = f"{prefix}-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(path, fname))
        for k in shard:
            index["weight_map"][k] = fname
    with open(os.path.join(path, f"{prefix}.safetensors.index.json"), "w") as f:
        json.dump(index, f, indent=2)


def load_wan_checkpoint(path: str, cfg: WanConfig) -> Dict:
    """Released Wan checkpoint dir -> flax params."""
    return torch_state_to_flax(load_safetensors_dir(path), cfg)


def save_wan_checkpoint(params: Dict, cfg: WanConfig, path: str,
                        step: Optional[int] = None) -> str:
    """Our params -> reference-format checkpoint-<step>/ dir."""
    if step is not None:
        path = os.path.join(path, f"checkpoint-{step}")
    state = flax_to_torch_state(jax.device_get(params), cfg)
    save_safetensors_sharded(state, path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "_class_name": "WanModel", "model_type": cfg.model_type,
            "dim": cfg.dim, "ffn_dim": cfg.ffn_dim, "freq_dim": cfg.freq_dim,
            "in_dim": cfg.in_dim, "out_dim": cfg.out_dim,
            "num_heads": cfg.num_heads, "num_layers": cfg.num_layers,
            "text_len": cfg.text_len, "eps": cfg.eps,
        }, f, indent=2)
    return path


def load_reward_head(path: str, kind: str):
    """Load a PAVRM reward head from either our orbax dir or a released
    torch checkpoint (mlp_step_<n>.ckpt / query_attention_step_<n>.ckpt,
    train_pavrm.py:993-998, network.py:216-217). kind: "mlp" | "qattn".
    Returns the flax param tree {"params": ...}."""
    if os.path.isdir(path):
        tree = load_orbax(path)
        return tree if "params" in tree else {"params": tree}
    from . import convert_encoders as ce

    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}
    conv = (ce.reward_mlp_torch_to_flax if kind == "mlp"
            else ce.query_attention_torch_to_flax)
    return conv(state)
