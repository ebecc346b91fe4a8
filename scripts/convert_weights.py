"""Convert released PyTorch checkpoints to this framework's formats.

    # Wan DiT (diffusers safetensors dir -> loads directly; this just
    # validates and optionally re-exports orbax)
    python scripts/convert_weights.py dit --src weights/Wan2.1-T2V-14B \
        --task t2v-14b --out weights_jax/t2v_14b

    # VAE / T5 / CLIP (.pth torch pickles -> orbax param trees)
    python scripts/convert_weights.py vae --src weights/Wan2.1_VAE.pth --out weights_jax/vae
    python scripts/convert_weights.py t5 --src weights/models_t5_umt5-xxl-enc-bf16.pth --out weights_jax/t5
    python scripts/convert_weights.py clip --src weights/models_clip_*.pth --out weights_jax/clip
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_torch_state(path):
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["dit", "vae", "t5", "clip", "mlp", "qattn"])
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--task", default="t2v-14b", help="dit only")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from hyvideo_prfl_tpu.utils import convert_encoders as ce

    if args.kind == "dit":
        from hyvideo_prfl_tpu.configs import dit_config_for_task

        cfg = dit_config_for_task(args.task)
        params = ck.load_wan_checkpoint(args.src, cfg)
        ck.save_orbax(args.out, params)
    else:
        state = _load_torch_state(args.src)
        if args.kind == "vae":
            from hyvideo_prfl_tpu.models.vae import VAEConfig

            params = ce.vae_torch_to_flax(state, VAEConfig())
        elif args.kind == "t5":
            from hyvideo_prfl_tpu.models.t5 import umt5_xxl

            params = ce.t5_torch_to_flax(state, umt5_xxl())
        elif args.kind == "clip":
            from hyvideo_prfl_tpu.models.clip import vit_h_14

            if "log_scale" in state:  # released combined open-clip ckpt
                from hyvideo_prfl_tpu.models.xlm_roberta import xlm_roberta_large

                params = ce.clip_full_torch_to_flax(state, vit_h_14(),
                                                    xlm_roberta_large())
            else:
                params = ce.clip_torch_to_flax(state, vit_h_14())
        elif args.kind == "mlp":
            params = ce.reward_mlp_torch_to_flax(state)
        else:  # qattn
            params = ce.query_attention_torch_to_flax(state)
        ck.save_orbax(args.out, params)
    logging.info("wrote %s", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
