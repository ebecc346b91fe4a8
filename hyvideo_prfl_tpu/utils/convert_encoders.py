"""torch -> flax converters for the frozen encoder towers.

Released checkpoints (config extra_model.*): models_t5_umt5-xxl-enc-bf16.pth,
models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth, Wan2.1_VAE.pth.
Key layouts follow the reference modules (wan/modules/{t5,clip,vae}.py);
these functions map their state dicts onto our scan-stacked flax trees.
Each has an inverse for roundtrip validation (and export).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPVisionConfig
from ..models.t5 import T5Config
from ..models.vae import VAEConfig


def _lin(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


# ---------------------------------------------------------------------------
# T5 (wan/modules/t5.py T5Encoder; encoder-only umt5-xxl, per-layer pos emb,
# no biases)
# ---------------------------------------------------------------------------


def t5_torch_to_flax(state: Dict[str, np.ndarray], cfg: T5Config) -> Dict:
    n = cfg.num_layers

    def stack_lin(fmt):
        return {"kernel": np.stack([_lin(state[fmt.format(i)])
                                    for i in range(n)])}

    def stack(fmt):
        return np.stack([np.asarray(state[fmt.format(i)]) for i in range(n)])

    blocks = {
        "norm1": stack("blocks.{}.norm1.weight"),
        "norm2": stack("blocks.{}.norm2.weight"),
        "attn": {
            "q": stack_lin("blocks.{}.attn.q.weight"),
            "k": stack_lin("blocks.{}.attn.k.weight"),
            "v": stack_lin("blocks.{}.attn.v.weight"),
            "o": stack_lin("blocks.{}.attn.o.weight"),
        },
        "gate": stack_lin("blocks.{}.ffn.gate.0.weight"),
        "fc1": stack_lin("blocks.{}.ffn.fc1.weight"),
        "fc2": stack_lin("blocks.{}.ffn.fc2.weight"),
    }
    if not cfg.shared_pos:
        blocks["rel_embedding"] = stack(
            "blocks.{}.pos_embedding.embedding.weight")
    p = {
        "token_embedding": np.asarray(state["token_embedding.weight"]),
        "norm": np.asarray(state["norm.weight"]),
        "blocks": blocks,
    }
    if cfg.shared_pos:
        p["shared_rel_embedding"] = np.asarray(
            state["pos_embedding.embedding.weight"])
    return {"params": jax.tree.map(jnp.asarray, p)}


def t5_flax_to_torch(params: Dict, cfg: T5Config) -> Dict[str, np.ndarray]:
    p = params["params"]
    out = {
        "token_embedding.weight": np.asarray(p["token_embedding"]),
        "norm.weight": np.asarray(p["norm"]),
    }
    b = p["blocks"]
    for i in range(cfg.num_layers):
        out[f"blocks.{i}.norm1.weight"] = np.asarray(b["norm1"])[i]
        out[f"blocks.{i}.norm2.weight"] = np.asarray(b["norm2"])[i]
        for m in ("q", "k", "v", "o"):
            out[f"blocks.{i}.attn.{m}.weight"] = _lin(
                np.asarray(b["attn"][m]["kernel"])[i])
        out[f"blocks.{i}.ffn.gate.0.weight"] = _lin(
            np.asarray(b["gate"]["kernel"])[i])
        out[f"blocks.{i}.ffn.fc1.weight"] = _lin(
            np.asarray(b["fc1"]["kernel"])[i])
        out[f"blocks.{i}.ffn.fc2.weight"] = _lin(
            np.asarray(b["fc2"]["kernel"])[i])
        if not cfg.shared_pos:
            out[f"blocks.{i}.pos_embedding.embedding.weight"] = np.asarray(
                b["rel_embedding"])[i]
    return out


# ---------------------------------------------------------------------------
# CLIP vision tower (wan/modules/clip.py VisionTransformer under `visual.`)
# ---------------------------------------------------------------------------


def clip_torch_to_flax(state: Dict[str, np.ndarray],
                       cfg: CLIPVisionConfig, prefix: str = "visual."
                       ) -> Dict:
    n = cfg.num_layers
    g = lambda k: np.asarray(state[prefix + k])

    def stack(fmt):
        return np.stack([g(fmt.format(i)) for i in range(n)])

    def stack_lin(fmt):
        return np.stack([_lin(g(fmt.format(i))) for i in range(n)])

    # torch Conv2d [dim, 3, p, p] -> flax [p, p, 3, dim]
    pk = np.transpose(g("patch_embedding.weight"), (2, 3, 1, 0))
    blocks = {
        "norm1_scale": stack("transformer.{}.norm1.weight"),
        "norm1_bias": stack("transformer.{}.norm1.bias"),
        "norm2_scale": stack("transformer.{}.norm2.weight"),
        "norm2_bias": stack("transformer.{}.norm2.bias"),
        "to_qkv": {
            "kernel": stack_lin("transformer.{}.attn.to_qkv.weight"),
            "bias": stack("transformer.{}.attn.to_qkv.bias"),
        },
        "proj": {
            "kernel": stack_lin("transformer.{}.attn.proj.weight"),
            "bias": stack("transformer.{}.attn.proj.bias"),
        },
        "mlp_fc1": {
            "kernel": stack_lin("transformer.{}.mlp.0.weight"),
            "bias": stack("transformer.{}.mlp.0.bias"),
        },
        "mlp_fc2": {
            "kernel": stack_lin("transformer.{}.mlp.2.weight"),
            "bias": stack("transformer.{}.mlp.2.bias"),
        },
    }
    p = {
        "patch_embedding": {"kernel": pk},
        "cls_embedding": g("cls_embedding"),
        "pos_embedding": g("pos_embedding"),
        "pre_norm_scale": g("pre_norm.weight"),
        "pre_norm_bias": g("pre_norm.bias"),
        "blocks": blocks,
    }
    return {"params": jax.tree.map(jnp.asarray, p)}


def clip_flax_to_torch(params: Dict, cfg: CLIPVisionConfig,
                       prefix: str = "visual.") -> Dict[str, np.ndarray]:
    p = params["params"]
    out = {
        prefix + "patch_embedding.weight": np.transpose(
            np.asarray(p["patch_embedding"]["kernel"]), (3, 2, 0, 1)),
        prefix + "cls_embedding": np.asarray(p["cls_embedding"]),
        prefix + "pos_embedding": np.asarray(p["pos_embedding"]),
        prefix + "pre_norm.weight": np.asarray(p["pre_norm_scale"]),
        prefix + "pre_norm.bias": np.asarray(p["pre_norm_bias"]),
    }
    b = p["blocks"]
    for i in range(cfg.num_layers):
        out[prefix + f"transformer.{i}.norm1.weight"] = np.asarray(b["norm1_scale"])[i]
        out[prefix + f"transformer.{i}.norm1.bias"] = np.asarray(b["norm1_bias"])[i]
        out[prefix + f"transformer.{i}.norm2.weight"] = np.asarray(b["norm2_scale"])[i]
        out[prefix + f"transformer.{i}.norm2.bias"] = np.asarray(b["norm2_bias"])[i]
        for src, dst in (("to_qkv", "attn.to_qkv"), ("proj", "attn.proj"),
                         ("mlp_fc1", "mlp.0"), ("mlp_fc2", "mlp.2")):
            out[prefix + f"transformer.{i}.{dst}.weight"] = _lin(
                np.asarray(b[src]["kernel"])[i])
            out[prefix + f"transformer.{i}.{dst}.bias"] = np.asarray(
                b[src]["bias"])[i]
    return out


# ---------------------------------------------------------------------------
# VAE (wan/modules/vae.py WanVAE_): Sequential-indexed keys -> named modules
# ---------------------------------------------------------------------------


def _conv3d(state, key):
    """torch Conv3d [out,in,kt,kh,kw] -> flax {kernel [kt,kh,kw,in,out], bias}."""
    w = np.asarray(state[key + ".weight"])
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0))),
            "bias": np.asarray(state[key + ".bias"])}


def _conv2d_as3d(state, key):
    """torch Conv2d [out,in,kh,kw] -> flax (1,kh,kw) conv kernel."""
    w = np.asarray(state[key + ".weight"])
    k = np.transpose(w, (2, 3, 1, 0))[None]  # [1,kh,kw,in,out]
    return {"kernel": np.ascontiguousarray(k),
            "bias": np.asarray(state[key + ".bias"])}


def _gamma(state, key):
    """RMS_norm gamma [C,1,1(,1)] -> [C]."""
    return np.asarray(state[key]).reshape(-1)


def _resblock(state, pfx):
    return {
        "norm1_gamma": _gamma(state, pfx + ".residual.0.gamma"),
        "conv1": _conv3d(state, pfx + ".residual.2"),
        "norm2_gamma": _gamma(state, pfx + ".residual.3.gamma"),
        "conv2": _conv3d(state, pfx + ".residual.6"),
        **({"shortcut": _conv3d(state, pfx + ".shortcut")}
           if pfx + ".shortcut.weight" in state else {}),
    }


def _attnblock(state, pfx):
    """AttentionBlock: 1x1 Conv2d qkv/proj -> Dense."""
    qkv_w = np.asarray(state[pfx + ".to_qkv.weight"])[:, :, 0, 0]  # [3C, C]
    proj_w = np.asarray(state[pfx + ".proj.weight"])[:, :, 0, 0]
    return {
        "norm_gamma": _gamma(state, pfx + ".norm.gamma"),
        "to_qkv": {"kernel": _lin(qkv_w),
                   "bias": np.asarray(state[pfx + ".to_qkv.bias"])},
        "proj": {"kernel": _lin(proj_w),
                 "bias": np.asarray(state[pfx + ".proj.bias"])},
    }


def vae_torch_to_flax(state: Dict[str, np.ndarray], cfg: VAEConfig) -> Dict:
    """Map the reference's Sequential-indexed encoder/decoder onto our named
    modules (Encoder3d/Decoder3d layouts, vae.py:266-473)."""
    mult = tuple(cfg.dim_mult)
    nres = cfg.num_res_blocks

    def tower(prefix, n_res_per_stage, n_stages, temporal_flags, down):
        p = {}
        p["conv1"] = _conv3d(state, prefix + ".conv1")
        seq = 0
        bi = 0
        for i in range(n_stages):
            for _ in range(n_res_per_stage):
                p[f"block_{bi}"] = _resblock(
                    state, f"{prefix}.{'downsamples' if down else 'upsamples'}.{seq}")
                seq += 1
                bi += 1
            if i != n_stages - 1:
                rs = f"{prefix}.{'downsamples' if down else 'upsamples'}.{seq}"
                node = {}
                if down:
                    node["conv_spatial"] = _conv2d_as3d(state, rs + ".resample.1")
                    if temporal_flags[i]:
                        node["time_conv"] = _conv3d(state, rs + ".time_conv")
                else:
                    node["conv_spatial"] = _conv2d_as3d(state, rs + ".resample.1")
                    if temporal_flags[i]:
                        node["time_conv"] = _conv3d(state, rs + ".time_conv")
                p[f"{'down' if down else 'up'}_{i}"] = node
                seq += 1
        p["mid_block_0"] = _resblock(state, prefix + ".middle.0")
        p["mid_attn"] = _attnblock(state, prefix + ".middle.1")
        p["mid_block_1"] = _resblock(state, prefix + ".middle.2")
        p["head_norm_gamma"] = _gamma(state, prefix + ".head.0.gamma")
        p["head_conv"] = _conv3d(state, prefix + ".head.2")
        return p

    p = {
        "encoder": tower("encoder", nres, len(mult),
                         cfg.temporal_downsample, down=True),
        "decoder": tower("decoder", nres + 1, len(mult),
                         cfg.temporal_upsample, down=False),
        "conv1": _conv3d(state, "conv1"),
        "conv2": _conv3d(state, "conv2"),
    }
    return {"params": jax.tree.map(jnp.asarray, p)}


def _inv_conv3d(node):
    w = np.asarray(node["kernel"])  # [kt,kh,kw,in,out]
    return (np.ascontiguousarray(np.transpose(w, (4, 3, 0, 1, 2))),
            np.asarray(node["bias"]))


def _inv_conv2d(node):
    w = np.asarray(node["kernel"])[0]  # [kh,kw,in,out]
    return (np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1))),
            np.asarray(node["bias"]))


def vae_flax_to_torch(params: Dict, cfg: VAEConfig) -> Dict[str, np.ndarray]:
    mult = tuple(cfg.dim_mult)
    nres = cfg.num_res_blocks
    out: Dict[str, np.ndarray] = {}

    def put_conv3d(key, node):
        out[key + ".weight"], out[key + ".bias"] = _inv_conv3d(node)

    def put_res(pfx, node, in_dim_shape_hint=None):
        c1 = np.asarray(node["norm1_gamma"])
        out[pfx + ".residual.0.gamma"] = c1.reshape(-1, 1, 1, 1)
        put_conv3d(pfx + ".residual.2", node["conv1"])
        out[pfx + ".residual.3.gamma"] = np.asarray(
            node["norm2_gamma"]).reshape(-1, 1, 1, 1)
        put_conv3d(pfx + ".residual.6", node["conv2"])
        if "shortcut" in node:
            put_conv3d(pfx + ".shortcut", node["shortcut"])

    def put_attn(pfx, node):
        out[pfx + ".norm.gamma"] = np.asarray(node["norm_gamma"]).reshape(-1, 1, 1)
        out[pfx + ".to_qkv.weight"] = _lin(
            np.asarray(node["to_qkv"]["kernel"]))[:, :, None, None]
        out[pfx + ".to_qkv.bias"] = np.asarray(node["to_qkv"]["bias"])
        out[pfx + ".proj.weight"] = _lin(
            np.asarray(node["proj"]["kernel"]))[:, :, None, None]
        out[pfx + ".proj.bias"] = np.asarray(node["proj"]["bias"])

    def tower(prefix, p, n_res_per_stage, n_stages, temporal_flags, down):
        put_conv3d(prefix + ".conv1", p["conv1"])
        seq = 0
        bi = 0
        kind = "downsamples" if down else "upsamples"
        for i in range(n_stages):
            for _ in range(n_res_per_stage):
                put_res(f"{prefix}.{kind}.{seq}", p[f"block_{bi}"])
                seq += 1
                bi += 1
            if i != n_stages - 1:
                node = p[f"{'down' if down else 'up'}_{i}"]
                rs = f"{prefix}.{kind}.{seq}"
                w, bias = _inv_conv2d(node["conv_spatial"])
                out[rs + ".resample.1.weight"] = w
                out[rs + ".resample.1.bias"] = bias
                if temporal_flags[i]:
                    put_conv3d(rs + ".time_conv", node["time_conv"])
                seq += 1
        put_res(prefix + ".middle.0", p["mid_block_0"])
        put_attn(prefix + ".middle.1", p["mid_attn"])
        put_res(prefix + ".middle.2", p["mid_block_1"])
        out[prefix + ".head.0.gamma"] = np.asarray(
            p["head_norm_gamma"]).reshape(-1, 1, 1, 1)
        put_conv3d(prefix + ".head.2", p["head_conv"])

    pp = params["params"]
    tower("encoder", pp["encoder"], nres, len(mult),
          cfg.temporal_downsample, down=True)
    tower("decoder", pp["decoder"], nres + 1, len(mult),
          cfg.temporal_upsample, down=False)
    put_conv3d("conv1", pp["conv1"])
    put_conv3d("conv2", pp["conv2"])
    return out


# ---------------------------------------------------------------------------
# PAVRM reward heads (utils/network.py MLP + QueryAttention; released as
# mlp_step_<n>.ckpt / query_attention_step_<n>.ckpt torch state dicts,
# train_pavrm.py:993-998)
# ---------------------------------------------------------------------------


def reward_mlp_torch_to_flax(state: Dict[str, np.ndarray]) -> Dict:
    """fc1/fc2/fc3 Linears (network.py:112-134) -> RewardMLP Dense_0..2."""
    return {"params": {
        f"Dense_{i}": {"kernel": jnp.asarray(_lin(state[f"fc{i + 1}.weight"])),
                       "bias": jnp.asarray(state[f"fc{i + 1}.bias"])}
        for i in range(3)
    }}


def reward_mlp_flax_to_torch(params: Dict) -> Dict[str, np.ndarray]:
    p = params["params"]
    out = {}
    for i in range(3):
        out[f"fc{i + 1}.weight"] = _lin(p[f"Dense_{i}"]["kernel"])
        out[f"fc{i + 1}.bias"] = np.asarray(p[f"Dense_{i}"]["bias"])
    return out


def query_attention_torch_to_flax(state: Dict[str, np.ndarray]) -> Dict:
    """torch nn.MultiheadAttention (fused in_proj) + learned queries
    (network.py:8-110) -> our explicit wq/wk/wv/wo tree. x @ w convention:
    kernel = torch_weight.T."""
    w_in = np.asarray(state["multihead_attn.in_proj_weight"])  # [3d, d]
    b_in = np.asarray(state["multihead_attn.in_proj_bias"])
    d = w_in.shape[1]
    p = {
        "queries": jnp.asarray(state["queries"]),
        "wq": jnp.asarray(_lin(w_in[:d])),
        "wk": jnp.asarray(_lin(w_in[d:2 * d])),
        "wv": jnp.asarray(_lin(w_in[2 * d:])),
        "bq": jnp.asarray(b_in[:d]),
        "bk": jnp.asarray(b_in[d:2 * d]),
        "bv": jnp.asarray(b_in[2 * d:]),
        "wo": jnp.asarray(_lin(state["multihead_attn.out_proj.weight"])),
        "bo": jnp.asarray(state["multihead_attn.out_proj.bias"]),
    }
    if "text_proj.weight" in state:
        p["text_proj"] = {"kernel": jnp.asarray(_lin(state["text_proj.weight"])),
                          "bias": jnp.asarray(state["text_proj.bias"])}
    return {"params": p}


def query_attention_flax_to_torch(params: Dict) -> Dict[str, np.ndarray]:
    p = params["params"]
    w_in = np.concatenate([_lin(p["wq"]), _lin(p["wk"]), _lin(p["wv"])])
    b_in = np.concatenate([np.asarray(p["bq"]), np.asarray(p["bk"]),
                           np.asarray(p["bv"])])
    out = {
        "queries": np.asarray(p["queries"]),
        "multihead_attn.in_proj_weight": w_in,
        "multihead_attn.in_proj_bias": b_in,
        "multihead_attn.out_proj.weight": _lin(p["wo"]),
        "multihead_attn.out_proj.bias": np.asarray(p["bo"]),
    }
    if "text_proj" in p:
        out["text_proj.weight"] = _lin(p["text_proj"]["kernel"])
        out["text_proj.bias"] = np.asarray(p["text_proj"]["bias"])
    return out


# ---------------------------------------------------------------------------
# XLM-RoBERTa text tower + projection head (wan/modules/xlm_roberta.py under
# XLMRobertaCLIP's "textual." prefix; head = XLMRobertaWithHead,
# clip.py:304-314) and the FULL open-clip checkpoint (visual + textual +
# log_scale — models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth)
# ---------------------------------------------------------------------------


def xlmr_torch_to_flax(state, cfg, prefix: str = "textual."):
    """-> {"params": {...}} for models.xlm_roberta.XLMRoberta (nn.scan
    stacked blocks) plus the projection-head kernels under "head"."""
    g = lambda k: np.asarray(state[prefix + k])
    n = cfg.num_layers

    def stack(fmt):
        return np.stack([g(fmt.format(i)) for i in range(n)])

    def stack_dense(fmt):
        return {"kernel": np.stack([_lin(g(fmt.format(i) + ".weight"))
                                    for i in range(n)]),
                "bias": stack(fmt + ".bias")}

    blocks = {
        "norm1_scale": stack("blocks.{}.norm1.weight"),
        "norm1_bias": stack("blocks.{}.norm1.bias"),
        "norm2_scale": stack("blocks.{}.norm2.weight"),
        "norm2_bias": stack("blocks.{}.norm2.bias"),
    }
    for name, tk in (("q", "blocks.{}.attn.q"), ("k", "blocks.{}.attn.k"),
                     ("v", "blocks.{}.attn.v"), ("o", "blocks.{}.attn.o"),
                     ("ffn_0", "blocks.{}.ffn.0"),
                     ("ffn_2", "blocks.{}.ffn.2")):
        blocks[name] = stack_dense(tk)
    return {
        "params": {
            "token_embedding": g("token_embedding.weight"),
            "type_embedding": g("type_embedding.weight"),
            "pos_embedding": g("pos_embedding.weight"),
            "norm_scale": g("norm.weight"),
            "norm_bias": g("norm.bias"),
            "blocks": blocks,
        },
        "head": {"h0": _lin(g("head.0.weight")),
                 "h2": _lin(g("head.2.weight"))},
    }


def xlmr_flax_to_torch(tree, cfg, prefix: str = "textual."):
    p = tree["params"]
    out = {
        prefix + "token_embedding.weight": np.asarray(p["token_embedding"]),
        prefix + "type_embedding.weight": np.asarray(p["type_embedding"]),
        prefix + "pos_embedding.weight": np.asarray(p["pos_embedding"]),
        prefix + "norm.weight": np.asarray(p["norm_scale"]),
        prefix + "norm.bias": np.asarray(p["norm_bias"]),
        prefix + "head.0.weight": _lin(tree["head"]["h0"]),
        prefix + "head.2.weight": _lin(tree["head"]["h2"]),
    }
    b = p["blocks"]
    for i in range(cfg.num_layers):
        out[prefix + f"blocks.{i}.norm1.weight"] = np.asarray(b["norm1_scale"])[i]
        out[prefix + f"blocks.{i}.norm1.bias"] = np.asarray(b["norm1_bias"])[i]
        out[prefix + f"blocks.{i}.norm2.weight"] = np.asarray(b["norm2_scale"])[i]
        out[prefix + f"blocks.{i}.norm2.bias"] = np.asarray(b["norm2_bias"])[i]
        for name, tk in (("q", "attn.q"), ("k", "attn.k"), ("v", "attn.v"),
                         ("o", "attn.o"), ("ffn_0", "ffn.0"),
                         ("ffn_2", "ffn.2")):
            out[prefix + f"blocks.{i}.{tk}.weight"] = _lin(
                np.asarray(b[name]["kernel"])[i])
            out[prefix + f"blocks.{i}.{tk}.bias"] = np.asarray(
                b[name]["bias"])[i]
    return out


def clip_full_torch_to_flax(state, vis_cfg, txt_cfg):
    """The whole released open-clip checkpoint: vision tower + XLM-R text
    tower + head + logit scale (XLMRobertaCLIP, clip.py:329-405).

    visual_extras carries weights that exist in the released tower but
    are DEAD in its forward: post_norm is registered unconditionally and
    never applied (clip.py VisionTransformer — self.post_norm is
    overwritten by a LayerNorm after the bool), and `head` is the
    contrastive pooling projection the i2v path (use_31_block penultimate
    tap) never reaches. Carried through so the real-checkpoint roundtrip
    is byte-complete."""
    out = {
        "visual": clip_torch_to_flax(state, vis_cfg),
        "textual": xlmr_torch_to_flax(state, txt_cfg),
        "log_scale": np.asarray(state["log_scale"]),
    }
    extras = {}
    if "visual.post_norm.weight" in state:
        extras["post_norm_scale"] = np.asarray(state["visual.post_norm.weight"])
        extras["post_norm_bias"] = np.asarray(state["visual.post_norm.bias"])
    if "visual.head" in state:
        extras["head"] = np.asarray(state["visual.head"])
    if extras:
        out["visual_extras"] = extras
    return out


def clip_full_flax_to_torch(tree, vis_cfg, txt_cfg):
    out = clip_flax_to_torch(tree["visual"], vis_cfg)
    out.update(xlmr_flax_to_torch(tree["textual"], txt_cfg))
    out["log_scale"] = np.asarray(tree["log_scale"])
    ex = tree.get("visual_extras", {})
    if "post_norm_scale" in ex:
        out["visual.post_norm.weight"] = np.asarray(ex["post_norm_scale"])
        out["visual.post_norm.bias"] = np.asarray(ex["post_norm_bias"])
    if "head" in ex:
        out["visual.head"] = np.asarray(ex["head"])
    return out
