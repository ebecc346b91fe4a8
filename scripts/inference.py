"""Generation CLI (t2v / i2v / flf2v).

Parity target: `scripts/prfl/inference_prfl.py` (args_wan_init surface,
arguments.py:68-216): --task, --size, --sample_steps, --sample_shift,
--sample_solver, --sample_guide_scale, --ckpt_dir, --ulysses_size /
--ring_size (mapped onto the sp mesh axis), dataset loop, mp4 export.

Runs from cached embeddings (the smoke/fixture path) or full encoders when
their weights are present.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hyvideo_prfl_tpu.configs import (
    MAX_AREA_CONFIGS, SIZE_CONFIGS, dit_config_for_task,
)
from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.parallel import sharding as shd
from hyvideo_prfl_tpu.pipelines.pipeline import (
    GenerateConfig, WanFLF2V, WanI2V, WanT2V, latent_size_for,
)
from hyvideo_prfl_tpu.utils import checkpoint as ck
from hyvideo_prfl_tpu.utils.video_io import cache_video


def args_init():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--size", default="480*832")
    p.add_argument("--frame_num", type=int, default=81)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--prompt", default=None,
                   help="raw text prompt (requires --t5_params)")
    p.add_argument("--negative_prompt", default=None,
                   help="defaults to the reference sample_neg_prompt "
                        "(shared_config.py:19)")
    p.add_argument("--t5_params", default=None,
                   help="converted umT5-XXL orbax weights for in-pipeline "
                        "text encoding")
    p.add_argument("--tokenizer", default="google/umt5-xxl")
    p.add_argument("--prompt_embeds", default=None,
                   help=".npy [1, L, 4096] cached T5 embedding")
    p.add_argument("--uncond_embeds", default=None)
    p.add_argument("--clip_embeds", default=None)
    p.add_argument("--cond_latent", default=None)
    p.add_argument("--sample_solver", default="unipc",
                   choices=["unipc", "euler", "dpm++"])
    p.add_argument("--sample_steps", type=int, default=None)
    p.add_argument("--sample_shift", type=float, default=None)
    p.add_argument("--sample_guide_scale", type=float, default=5.0)
    p.add_argument("--base_seed", type=int, default=42)
    p.add_argument("--teacache_thresh", type=float, default=None,
                   help="enable TeaCache step skipping (arguments.py:170-174)")
    p.add_argument("--ulysses_size", type=int, default=1)
    p.add_argument("--ring_size", type=int, default=1,
                   help="ring attention degree; ring*ulysses devices form "
                        "the USP sequence mesh (inference_prfl.py:71-82)")
    p.add_argument("--save_file", default="out.mp4")
    p.add_argument("--vae_params", default=None)
    p.add_argument("--decode_chunk", type=int, default=-1,
                   help="latent frames per streaming-decode chunk "
                        "(bounded memory; the reference's feat_cache path)."
                        " 0 = whole-clip decode; -1 (default) = auto: "
                        "stream for clips over 5 latent frames")
    args = p.parse_args()
    # smart defaults (arguments.py:196-207)
    if args.sample_steps is None:
        args.sample_steps = 40 if "i2v" in args.task else 50
    if args.sample_shift is None:
        args.sample_shift = 3.0 if ("i2v" in args.task and "480" in args.size) else 5.0
    return args


def main():
    args = args_init()
    logging.basicConfig(level=logging.INFO)
    dit_cfg = dit_config_for_task(args.task)

    if args.ckpt_dir and os.path.isdir(args.ckpt_dir):
        params = ck.load_wan_checkpoint(args.ckpt_dir, dit_cfg)
    else:
        logging.warning("no --ckpt_dir; random weights (smoke mode)")
        params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0))

    n_dev = len(jax.devices())
    sp = min(args.ulysses_size, n_dev)
    ring = min(args.ring_size, n_dev // sp)
    if ring > 1:
        data = n_dev // (ring * sp)
        mesh = shd.make_usp_mesh(data=data, ring=ring, ulysses=sp,
                                 devices=jax.devices()[: data * ring * sp])
        policy = shd.usp_policy()
    else:
        mesh = shd.make_mesh(data=n_dev // sp, sp=sp,
                             devices=jax.devices()[: (n_dev // sp) * sp])
        policy = shd.ShardingPolicy() if mesh.devices.size > 1 else None

    def load_or_zeros(path, shape):
        if path and os.path.exists(path):
            a = np.load(path)
            return jnp.asarray(a if a.ndim == 3 else a[None])
        return jnp.zeros(shape, jnp.float32)

    if args.prompt is not None:
        # in-pipeline T5 encoding with the reference default negative
        # prompt (text2video.py:219, shared_config.py:19)
        from hyvideo_prfl_tpu.configs import SAMPLE_NEG_PROMPT
        from hyvideo_prfl_tpu.models import t5 as t5_mod
        from hyvideo_prfl_tpu.utils.tokenizers import HuggingfaceTokenizer

        if not (args.t5_params and os.path.exists(args.t5_params)):
            logging.error("--prompt requires --t5_params (converted "
                          "umT5-XXL weights)")
            return 1
        t5_cfg = t5_mod.umt5_xxl()
        t5_params = ck.load_orbax(args.t5_params)
        tok = HuggingfaceTokenizer(args.tokenizer, seq_len=512,
                                   clean="whitespace")
        encode = jax.jit(
            lambda ids, m: t5_mod.encode_text(t5_params, t5_cfg, ids, m))

        def embed(text):
            ids, mask = tok([text], return_mask=True)
            return jnp.asarray(encode(jnp.asarray(ids), jnp.asarray(mask)))

        neg = (args.negative_prompt if args.negative_prompt is not None
               else SAMPLE_NEG_PROMPT)
        ctx = embed(args.prompt)
        ctx_null = embed(neg)
    else:
        ctx = load_or_zeros(args.prompt_embeds, (1, 512, dit_cfg.text_dim))
        ctx_null = load_or_zeros(args.uncond_embeds,
                                 (1, 512, dit_cfg.text_dim))

    w, h = SIZE_CONFIGS[args.size]
    lat_f, lat_h, lat_w = latent_size_for(
        MAX_AREA_CONFIGS.get(args.size, w * h), h / w,
        num_frames=args.frame_num, sp_size=sp,
    )
    gen = GenerateConfig(
        sampling_steps=args.sample_steps, shift=args.sample_shift,
        guide_scale=args.sample_guide_scale, sample_solver=args.sample_solver,
    )

    with jax.set_mesh(mesh):
        rng = jax.random.PRNGKey(args.base_seed)
        if "t2v" in args.task:
            pipe = WanT2V(dit_cfg, params, policy)
            if args.teacache_thresh is not None:
                key = ("t2v-1.3b" if "1.3" in args.task.lower() else "t2v-14b")
                lat = pipe.sample_teacache(
                    rng, (1, lat_f, lat_h, lat_w, 16), ctx, ctx_null, gen,
                    thresh=args.teacache_thresh, coeffs_key=key)
            else:
                lat = pipe.generate(rng, ctx, ctx_null, lat_f, lat_h, lat_w, gen)
        else:
            clip = load_or_zeros(args.clip_embeds, (1, 257, 1280))
            cond = load_or_zeros(
                args.cond_latent, (1, lat_f, lat_h // 2, lat_w // 2, 16))
            cls = WanFLF2V if "flf2v" in args.task else WanI2V
            pipe = cls(dit_cfg, params, policy)
            lat = pipe.generate(rng, ctx, ctx_null, clip, cond, gen)

    logging.info("latents: %s", lat.shape)
    # fetch the (small) latents to host BEFORE any decode attempt, then
    # release the DiT: 14B/1.3B fp32 weights + their bf16 compute copies
    # would otherwise stay resident in HBM through the VAE decode (the
    # reference's offload_model=True teardown, text2video.py) — and on
    # backends that only free buffers at process exit, a failed decode
    # leaves the device heap exhausted for any later fetch.
    lat = np.asarray(lat)
    del pipe
    params = None
    ctx = ctx_null = None
    jax.clear_caches()
    import gc

    gc.collect()
    if args.vae_params and os.path.exists(args.vae_params):
        from hyvideo_prfl_tpu.models import vae as vae_mod

        vae_cfg = vae_mod.VAEConfig()
        vae = vae_mod.WanVAE(vae_cfg)
        vae_params = ck.load_orbax(args.vae_params)
        chunk = args.decode_chunk
        if chunk < 0:
            chunk = 1 if lat.shape[1] > 5 else 0
        try:
            if chunk > 0:
                video = vae_mod.decode_streaming(vae_params, vae_cfg, lat,
                                                 frames_per_chunk=chunk)
            else:
                video = vae.apply(vae_params, lat, method=vae.decode)
            video = np.asarray(jax.block_until_ready(video))
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            # some backends don't release the sampling phase's buffers
            # until process exit: decode in a fresh process instead
            logging.warning("in-process decode OOM; re-running decode in "
                            "a fresh process (scripts/decode_latents.py)")
            import subprocess
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".npy") as f:
                np.save(f.name, np.asarray(lat))
                rc = subprocess.run([
                    sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "decode_latents.py"),
                    "--latents", f.name, "--vae_params", args.vae_params,
                    "--save_file", args.save_file,
                    "--decode_chunk", str(max(chunk, 1)),
                ]).returncode
            return rc
        written = cache_video(video[0], args.save_file)
        if written:
            logging.info("wrote %s", written)
        else:
            fallback = args.save_file.replace(".mp4", "_frames.npy")
            np.save(fallback, video[0])
            logging.error("mp4 write failed (no codec backend); wrote "
                          "raw frames to %s", fallback)
    else:
        np.save(args.save_file.replace(".mp4", "_latents.npy"),
                np.asarray(lat))
        logging.info("no VAE weights; wrote latents npy instead")


if __name__ == "__main__":
    main()
