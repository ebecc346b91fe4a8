"""Decode cached latents to video — standalone VAE decode CLI.

Useful on its own (decode a training sanity dump or a saved generation),
and used by scripts/inference.py as a fresh-process fallback when the
in-process decode cannot get HBM back from the sampling phase (some
backends do not release device buffers until process exit).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--latents", required=True,
                   help=".npy [B, F, H, W, 16] (or reference [B, 16, F, H, W])")
    p.add_argument("--vae_params", required=True)
    p.add_argument("--save_file", default="out.mp4")
    p.add_argument("--decode_chunk", type=int, default=1,
                   help="latent frames per streaming chunk; 0 = whole-clip")
    p.add_argument("--dtype", default="auto",
                   choices=("auto", "float32", "bfloat16"),
                   help="stream compute dtype; auto picks bfloat16 when the "
                        "pixel volume is too large for a single-chip fp32 "
                        "stream (720p x 81f fp32 needs ~16 GB HBM)")
    p.add_argument("--fps", type=int, default=15)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from hyvideo_prfl_tpu.models import vae as vae_mod
    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from hyvideo_prfl_tpu.utils.video_io import cache_video

    lat = np.load(args.latents)
    if lat.ndim == 4:
        lat = lat[None]
    if lat.shape[1] == 16 and lat.shape[-1] != 16:  # reference NCTHW layout
        lat = np.transpose(lat, (0, 2, 3, 4, 1))
    params = ck.load_orbax(args.vae_params)
    # config from the checkpoint itself (works for released-full and tiny
    # test checkpoints alike; models/vae.infer_config)
    cfg = vae_mod.infer_config(params)
    if args.dtype == "auto":
        # pixel frames x H x W after the (4x, 8x, 8x) upsample; 64M is
        # between 480p x 81f (32M: fp32 fits 16 GB) and 720p x 81f (75M:
        # fp32 OOMs, bf16 measured ~8 GB)
        t_up = 2 ** sum(cfg.temporal_downsample)
        pixels = (1 + (lat.shape[1] - 1) * t_up) * lat.shape[2] * lat.shape[3] * 64
        dtype = jnp.bfloat16 if pixels > 64e6 else jnp.float32
    else:
        dtype = jnp.dtype(args.dtype)
    logging.info("decode dtype: %s", jnp.dtype(dtype).name)
    if args.decode_chunk > 0:
        video = vae_mod.decode_streaming(params, cfg, lat,
                                         frames_per_chunk=args.decode_chunk,
                                         dtype=dtype, host_stream=True)
    else:
        vae = vae_mod.WanVAE(cfg)
        video = vae.apply(params, lat, method=vae.decode)
    video = np.asarray(jax.block_until_ready(video))
    written = cache_video(video[0], args.save_file, fps=args.fps)
    if written:
        logging.info("wrote %s", written)
        return 0
    fallback = args.save_file.replace(".mp4", "_frames.npy")
    np.save(fallback, video[0])
    logging.error("mp4 write failed; wrote raw frames to %s", fallback)
    return 1


if __name__ == "__main__":
    sys.exit(main())
