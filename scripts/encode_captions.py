"""Encode captions to T5 embeddings for the latent cache.

The T5 half of the preprocess pipeline (gen_wanx_latent.py:301-309 encodes
short+long captions per clip; also produces the NULL_DIR null/uncond
embeddings, constants.py:9). Requires converted umT5-XXL weights (orbax) and
the HF tokenizer assets; exits with a clear message otherwise.

    python scripts/encode_captions.py --meta_dir latent_cache/meta_v1 \
        --t5_params weights/umt5_xxl_orbax --tokenizer google/umt5-xxl
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def make_t5_embedder(t5_params_path: str, tokenizer: str = "google/umt5-xxl",
                     text_len: int = 512):
    """embed(text) -> [1, n_tokens, 4096] fp32, or None when the weights /
    tokenizer assets are absent. Shared by this CLI and gen_latents.py's
    single-pass mode (the reference encodes captions in the same pass as
    the VAE/CLIP, gen_wanx_latent.py:301-309)."""
    if not t5_params_path or not os.path.exists(t5_params_path):
        return None
    import jax

    from hyvideo_prfl_tpu.models import t5 as t5_mod
    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from hyvideo_prfl_tpu.utils.tokenizers import HuggingfaceTokenizer

    cfg = t5_mod.umt5_xxl()
    if t5_params_path.endswith((".pth", ".pt")):
        # released torch pickle (reference text_encoder_path) -> in-memory
        # conversion; no prior convert_weights.py run needed
        from hyvideo_prfl_tpu.utils import convert_encoders as ce
        from scripts.convert_weights import _load_torch_state

        params = ce.t5_torch_to_flax(_load_torch_state(t5_params_path), cfg)
    else:
        params = ck.load_orbax(t5_params_path)
    try:
        tok = HuggingfaceTokenizer(tokenizer, seq_len=text_len,
                                   clean="whitespace")
    except Exception as e:  # tokenizer assets unavailable
        logging.error("tokenizer %s unavailable: %s", tokenizer, e)
        return None
    encode = jax.jit(
        lambda ids, mask: t5_mod.encode_text(params, cfg, ids, mask))

    def embed(text):
        ids, mask = tok([text], return_mask=True)
        out = np.asarray(encode(jnp.asarray(ids), jnp.asarray(mask)))
        n = int(mask.sum())
        return out[:, :max(n, 1)]

    return embed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meta_dir", required=True,
                   help="dir of *_meta_v1.json manifests to fill in")
    p.add_argument("--t5_params", required=True)
    p.add_argument("--tokenizer", default="google/umt5-xxl")
    p.add_argument("--text_len", type=int, default=512)
    p.add_argument("--null_dir", default=None,
                   help="also write null/uncond embeddings here")
    p.add_argument("--negative_prompt", default="")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    embed = make_t5_embedder(args.t5_params, args.tokenizer, args.text_len)
    if embed is None:
        logging.error("T5 params not found at %s — convert the released "
                      "umT5-XXL checkpoint first", args.t5_params)
        return 1

    if args.null_dir:
        os.makedirs(os.path.join(args.null_dir, "wanx"), exist_ok=True)
        np.save(os.path.join(args.null_dir, "wanx", "null.npy"), embed(""))
        np.save(os.path.join(args.null_dir, "wanx", "uncond.npy"),
                embed(args.negative_prompt))
        logging.info("wrote null/uncond embeddings to %s", args.null_dir)

    for fname in sorted(os.listdir(args.meta_dir)):
        if not fname.endswith("_meta_v1.json"):
            continue
        path = os.path.join(args.meta_dir, fname)
        with open(path) as f:
            meta = json.load(f)
        if "textshort_path" in meta and os.path.exists(meta["textshort_path"]):
            continue
        base = meta.get("source_id", fname.replace("_meta_v1.json", ""))
        lat_dir = os.path.dirname(meta.get("vae_latent_path", path))
        short_p = os.path.join(lat_dir, f"{base}_textshort.npy")
        long_p = os.path.join(lat_dir, f"{base}_textlong.npy")
        np.save(short_p, embed(meta.get("short_caption", "")))
        np.save(long_p, embed(meta.get("long_caption",
                                       meta.get("short_caption", ""))))
        meta["textshort_path"] = short_p
        meta["textlong_path"] = long_p
        with open(path, "w") as f:
            json.dump(meta, f, indent=2, ensure_ascii=False)
        logging.info("encoded %s", base)
    return 0


if __name__ == "__main__":
    sys.exit(main())
