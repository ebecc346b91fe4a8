"""Generation CLI (t2v / i2v / flf2v).

Parity target: `scripts/prfl/inference_prfl.py` (args_wan_init surface,
arguments.py:68-216): --task, --size, --sample_steps, --sample_shift,
--sample_solver, --sample_guide_scale, --ckpt_dir, --ulysses_size /
--ring_size (mapped onto the sp mesh axis), dataset loop, mp4 export.

End-to-end from user inputs (image2video.py:262-301):
* --prompt runs in-pipeline T5 (with the reference default negative prompt);
  --prompt_embeds/--uncond_embeds take cached .npys instead.
* --image (+ --last_image for flf2v) runs in-pipeline CLIP visual + a
  streaming VAE encode of [img, zeros...] + the 4-channel mask concat —
  no precomputed conditioning npys needed.
* --prompt_file loops an EvalPromptDataset (txt prompts or JSON records
  with image_path), writing one mp4 per record (inference_prfl.py:339-379).
* --lora_path merges a LoRA checkpoint (transformer/kohya/diffusers key
  formats) into the DiT at load (image2video.py:115-131,
  diffusion_utils.py:152-309).
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


def args_init(argv=None):
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
    p.add_argument("--prompt_file", default=None,
                   help="txt (one prompt/line) or JSON list of "
                        "{prompt, image_path?} records; writes one mp4 per "
                        "record (inference_prfl.py:339-379)")
    p.add_argument("--image", default=None,
                   help="input image for i2v/flf2v: in-pipeline CLIP visual"
                        " + streaming VAE encode of [img, zeros] "
                        "(image2video.py:262-301); replaces "
                        "--clip_embeds/--cond_latent")
    p.add_argument("--last_image", default=None,
                   help="last frame for flf2v (first_last_frame2video.py)")
    p.add_argument("--t5_params", default=None,
                   help="converted umT5-XXL orbax weights for in-pipeline "
                        "text encoding")
    p.add_argument("--clip_params", default=None,
                   help="converted CLIP ViT-H/14 visual-tower orbax weights"
                        " (required with --image)")
    p.add_argument("--tokenizer", default="google/umt5-xxl")
    p.add_argument("--prompt_embeds", default=None,
                   help=".npy [1, L, 4096] cached T5 embedding")
    p.add_argument("--uncond_embeds", default=None)
    p.add_argument("--clip_embeds", default=None)
    p.add_argument("--cond_latent", default=None)
    p.add_argument("--transformer_path", default=None,
                   help="post-trained DiT checkpoint dir loaded INSTEAD of "
                        "--ckpt_dir's transformer (the reference's "
                        "WanModel.from_pretrained(transformer_path), "
                        "image2video.py:108-110); accepts reference-format "
                        "safetensors dirs (which scripts/train_prfl.py "
                        "exports) or orbax dirs")
    p.add_argument("--lora_path", default=None,
                   help="LoRA checkpoint (.safetensors/.npz, any of the "
                        "transformer/kohya/diffusers key formats) merged "
                        "into the DiT at load (diffusion_utils.py:152-309)")
    p.add_argument("--lora_scale", "--lora_alpha", type=float, default=1.0,
                   dest="lora_scale",
                   help="merge scale for --lora_path (the reference's "
                        "--lora_alpha)")
    p.add_argument("--distill_lora_path", default=None,
                   help="second LoRA (e.g. a distill adapter) merged after "
                        "--lora_path (arguments.py:188-189)")
    p.add_argument("--distill_lora_alpha", type=float, default=1.0)
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
    p.add_argument("--ulysses_chunks", type=int,
                   default=int(os.environ.get("HYV_ULYSSES_CHUNKS", "1")),
                   help="head-chunk the Ulysses a2a sandwich so flash "
                        "kernels overlap the all_to_alls (async-a2a libtpu "
                        "flags enabled automatically; single-chip kernel "
                        "cost ~0, scripts/profile_ulysses_chunk.py)")
    p.add_argument("--quant", choices=("none", "int8"), default="none",
                   help="serve the DiT block matmuls as W8A8 int8 MXU dots "
                        "(~2.2x the bf16 dense rate on v5e; ops/quant.py). "
                        "Quality is checkpoint-dependent — compare against "
                        "a bf16 sample before production use")
    p.add_argument("--quant_attn", choices=("none", "int8"), default="none",
                   help="additionally run the self-attention qk^T matmul "
                        "on the int8 MXU (per-head q/k quantization inside "
                        "the bounded flash forward; ring_size must be 1). "
                        "Same quality caveat as --quant")
    p.add_argument("--save_file", default="out.mp4")
    p.add_argument("--save_folder", default=None,
                   help="directory for outputs (inference_prfl.py "
                        "--save_folder); --save_file is interpreted "
                        "relative to it")
    # accepted for reference-CLI compatibility; sharding is always-on via
    # the device mesh on TPU and models never round-trip host memory
    # mid-step, so these are informational no-ops (args_wan_init
    # --offload_model/--t5_fsdp/--t5_cpu/--dit_fsdp)
    p.add_argument("--offload_model", default=None)
    p.add_argument("--t5_fsdp", action="store_true")
    p.add_argument("--t5_cpu", action="store_true")
    p.add_argument("--dit_fsdp", action="store_true")
    p.add_argument("--vae_params", default=None)
    p.add_argument("--decode_chunk", type=int, default=-1,
                   help="latent frames per streaming-decode chunk "
                        "(bounded memory; the reference's feat_cache path)."
                        " 0 = whole-clip decode; -1 (default) = auto: "
                        "stream for clips over 5 latent frames")
    p.add_argument("--smoke_tiny", action="store_true",
                   help="tiny model sizes for CI smoke runs (random "
                        "weights; exercises the full pipeline wiring)")
    args = p.parse_args(argv)
    # smart defaults (arguments.py:196-214)
    if "t2i" in args.task:
        if args.frame_num == p.get_default("frame_num"):
            args.frame_num = 1
        assert args.frame_num == 1, (
            f"Unsupport frame_num {args.frame_num} for task {args.task}")
    if args.sample_steps is None:
        args.sample_steps = 40 if "i2v" in args.task else 50
    if args.sample_shift is None:
        args.sample_shift = 3.0 if ("i2v" in args.task and "480" in args.size) else 5.0
    if args.base_seed < 0:  # arguments.py:213-214
        import random

        args.base_seed = random.randint(0, 2**31 - 1)
    if args.save_folder:
        os.makedirs(args.save_folder, exist_ok=True)
        args.save_file = os.path.join(args.save_folder,
                                      os.path.basename(args.save_file))
    if args.offload_model or args.t5_fsdp or args.t5_cpu or args.dit_fsdp:
        logging.info("offload/fsdp flags accepted for CLI compatibility: "
                     "TPU build shards params over the mesh unconditionally")
    return args


def _load_state_dict(path):
    """Flat torch-style state dict from .safetensors file/dir or .npz."""
    if os.path.isdir(path):
        return ck.load_safetensors_dir(path)
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    return dict(np.load(path))


def _make_text_embedder(args, dit_cfg):
    """Returns embed(text) -> [1, 512, text_dim] or None (cached mode)."""
    if args.prompt is None and args.prompt_file is None:
        return None
    if args.smoke_tiny and not args.t5_params:
        logging.warning("smoke_tiny: hashed pseudo-embeddings stand in "
                        "for T5")

        def embed(text):
            seed = abs(hash(text)) % (2 ** 31)
            return jax.random.normal(
                jax.random.PRNGKey(seed),
                (1, dit_cfg.text_len, dit_cfg.text_dim)) * 0.1

        return embed
    if not (args.t5_params and os.path.exists(args.t5_params)):
        raise SystemExit("--prompt/--prompt_file requires --t5_params "
                         "(converted umT5-XXL weights)")
    from hyvideo_prfl_tpu.models import t5 as t5_mod
    from hyvideo_prfl_tpu.utils.tokenizers import HuggingfaceTokenizer

    t5_cfg = t5_mod.umt5_xxl()
    t5_params = ck.load_orbax(args.t5_params)
    tok = HuggingfaceTokenizer(args.tokenizer, seq_len=512,
                               clean="whitespace")
    encode = jax.jit(
        lambda ids, m: t5_mod.encode_text(t5_params, t5_cfg, ids, m))

    def embed(text):
        ids, mask = tok([text], return_mask=True)
        return jnp.asarray(encode(jnp.asarray(ids), jnp.asarray(mask)))

    return embed


class _ImageConditioner:
    """PIL image(s) -> (clip_fea, cond_latent) for i2v/flf2v
    (image2video.py:287-301: CLIP visual on the first frame + VAE encode of
    [img, zeros...] pixel video; flf2v stacks first+last CLIP tokens and
    puts the last image in the final frame)."""

    def __init__(self, args, dit_cfg):
        from hyvideo_prfl_tpu.models import clip as clip_mod
        from hyvideo_prfl_tpu.models import vae as vae_mod

        self.clip_mod, self.vae_mod = clip_mod, vae_mod
        self.smoke = args.smoke_tiny
        if args.smoke_tiny:
            # z_dim 16 so the cond latent matches the DiT's 16-channel
            # conditioning slot
            self.vae_cfg = vae_mod.tiny_vae(z_dim=16)
            self.clip_cfg = clip_mod.tiny_clip()
        else:
            self.vae_cfg = vae_mod.VAEConfig()
            self.clip_cfg = clip_mod.vit_h_14()
        if args.vae_params and os.path.exists(args.vae_params):
            self.vae_params = ck.load_orbax(args.vae_params)
        elif args.smoke_tiny:
            self.vae_params = vae_mod.init_vae_params(
                self.vae_cfg, jax.random.PRNGKey(0))
        else:
            raise SystemExit("--image requires --vae_params")
        if args.clip_params and os.path.exists(args.clip_params):
            # accepts visual-only and full combined-checkpoint trees
            self.clip_params = ck.load_clip_visual(args.clip_params)
        elif args.smoke_tiny:
            self.clip_params = clip_mod.init_clip_params(
                self.clip_cfg, jax.random.PRNGKey(1))
        else:
            raise SystemExit("--image requires --clip_params")
        self.clip_tower = clip_mod.CLIPVisionTower(self.clip_cfg)
        self._clip_jit = jax.jit(
            lambda p, x: self.clip_tower.apply(p, x))

    def _load_image(self, path, h, w):
        from PIL import Image

        img = Image.open(path).convert("RGB").resize(
            (w, h), Image.BICUBIC)
        return np.asarray(img, np.float32) / 127.5 - 1.0  # [H, W, 3]

    def __call__(self, image_path, last_image_path, lat_f, lat_h, lat_w):
        stride_h = 2 ** (len(self.vae_cfg.dim_mult) - 1)
        h_pix, w_pix = lat_h * stride_h, lat_w * stride_h
        first = self._load_image(image_path, h_pix, w_pix)
        frames = [first]
        if last_image_path:
            frames.append(self._load_image(last_image_path, h_pix, w_pix))
        clip_in = self.clip_mod.preprocess_frames(
            np.stack(frames), self.clip_cfg.image_size)
        clip_fea = self._clip_jit(self.clip_params, jnp.asarray(clip_in))
        # pixel video [1, 4(F-1)+1, H, W, 3]: first frame, zeros, (last)
        t_stride = 2 ** sum(self.vae_cfg.temporal_downsample)
        f_pix = (lat_f - 1) * t_stride + 1
        vid = np.zeros((1, f_pix, h_pix, w_pix, 3), np.float32)
        vid[0, 0] = first
        if last_image_path:
            vid[0, -1] = frames[1]
        cond = self.vae_mod.encode_streaming(
            self.vae_params, self.vae_cfg, jnp.asarray(vid))
        return clip_fea, cond


def _decode_and_write(lat, args, save_file):
    """Latents -> mp4 (streaming decode, fresh-process OOM fallback)."""
    if not (args.vae_params and os.path.exists(args.vae_params)) \
            and not args.smoke_tiny:
        np.save(save_file.replace(".mp4", "_latents.npy"), np.asarray(lat))
        logging.info("no VAE weights; wrote latents npy instead")
        return 0
    from hyvideo_prfl_tpu.models import vae as vae_mod

    if args.smoke_tiny:
        vae_cfg = vae_mod.tiny_vae(z_dim=16)
        vae_params = (ck.load_orbax(args.vae_params)
                      if args.vae_params and os.path.exists(args.vae_params)
                      else vae_mod.init_vae_params(vae_cfg,
                                                   jax.random.PRNGKey(0)))
    else:
        vae_cfg = vae_mod.VAEConfig()
        vae_params = ck.load_orbax(args.vae_params)
    vae = vae_mod.WanVAE(vae_cfg)
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
        # some backends don't release the sampling phase's buffers until
        # process exit: decode in a fresh process instead
        logging.warning("in-process decode OOM; re-running decode in a "
                        "fresh process (scripts/decode_latents.py)")
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".npy") as f:
            np.save(f.name, np.asarray(lat))
            return subprocess.run([
                sys.executable,
                os.path.join(os.path.dirname(__file__), "decode_latents.py"),
                "--latents", f.name, "--vae_params", args.vae_params,
                "--save_file", save_file,
                "--decode_chunk", str(max(chunk, 1)),
            ]).returncode
    if video.shape[1] == 1:  # t2i: single frame -> image file
        from hyvideo_prfl_tpu.utils.video_io import cache_image

        img_file = save_file
        if img_file.endswith(".mp4"):
            img_file = img_file[:-4] + ".png"
        written = cache_image(video[0, 0], img_file)
    else:
        written = cache_video(video[0], save_file)
    if written:
        logging.info("wrote %s", written)
    else:
        fallback = save_file.replace(".mp4", "_frames.npy")
        np.save(fallback, video[0])
        logging.error("mp4 write failed (no codec backend); wrote raw "
                      "frames to %s", fallback)
    return 0


def main(argv=None):
    args = args_init(argv)
    logging.basicConfig(level=logging.INFO)
    if args.ulysses_chunks > 1:
        # before the first jax.devices(): libtpu reads LIBTPU_INIT_ARGS at
        # backend init, and the chunked sandwich reads HYV_ULYSSES_CHUNKS
        # at trace time (ops/attention.ulysses_chunks)
        os.environ["HYV_ULYSSES_CHUNKS"] = str(args.ulysses_chunks)
        shd.enable_async_collectives()
    if args.smoke_tiny:
        t2x = "t2v" in args.task or "t2i" in args.task
        dit_cfg = wan_dit.tiny_test(
            model_type=("t2v" if t2x
                        else "flf2v" if "flf2v" in args.task else "i2v"),
            in_dim=16 if t2x else 36,
        )
    else:
        dit_cfg = dit_config_for_task(args.task)

    is_i2v = "t2v" not in args.task and "t2i" not in args.task
    conditioner = None
    if is_i2v and (args.image or args.prompt_file):
        conditioner = _ImageConditioner(args, dit_cfg)

    # smoke-tiny clip features don't match the 1280-dim MLPProj: init DiT
    # against the actual clip token shape
    clip_shape = None
    if args.smoke_tiny and conditioner is not None:
        tokens = conditioner.clip_cfg.num_patches + 1
        clip_shape = (tokens, conditioner.clip_cfg.dim)

    if args.transformer_path and os.path.isdir(args.transformer_path):
        # post-trained DiT replaces the base transformer entirely
        # (image2video.py:108-110 WanModel.from_pretrained)
        if any(f.endswith(".safetensors")
               for f in os.listdir(args.transformer_path)):
            params = ck.load_wan_checkpoint(args.transformer_path, dit_cfg)
        else:
            params = ck.load_orbax(args.transformer_path)
        logging.info("loaded transformer from %s", args.transformer_path)
    elif args.ckpt_dir and os.path.isdir(args.ckpt_dir):
        params = ck.load_wan_checkpoint(args.ckpt_dir, dit_cfg)
    else:
        logging.warning("no --ckpt_dir; random weights (smoke mode)")
        params = wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0),
                                     clip_shape=clip_shape)

    for lora_path, scale in ((args.lora_path, args.lora_scale),
                             (args.distill_lora_path,
                              args.distill_lora_alpha)):
        if not lora_path:
            continue
        from hyvideo_prfl_tpu.training import lora as lora_mod

        state = _load_state_dict(lora_path)
        lora = lora_mod.lora_from_state_dict(state,
                                             head_dim=dit_cfg.head_dim)
        params = lora_mod.apply_lora(params, lora, scale=scale)
        n = sum(len(m) for m in lora["lora"].values())
        logging.info("merged LoRA from %s (%d modules, scale %.2f)",
                     lora_path, n, scale)

    if args.quant == "int8":
        # quantize AFTER LoRA merges (the int8 tree has no mergeable
        # kernels) and BEFORE the bf16 cast/sharding below
        import dataclasses as _dc

        from hyvideo_prfl_tpu.ops import quant as quant_mod

        dit_cfg = _dc.replace(dit_cfg, quant_dense="int8")
        qshapes = jax.eval_shape(
            lambda: wan_dit.init_params(dit_cfg, jax.random.PRNGKey(0),
                                        clip_shape=clip_shape))
        params = quant_mod.quantize_params(params, qshapes)
        logging.info("quantized block matmuls to int8 (W8A8 serving path)")

    if args.quant_attn == "int8":
        import dataclasses as _dc

        if args.ring_size > 1:
            logging.warning("--quant_attn int8 needs ring_size 1 (pure "
                            "Ulysses); keeping bf16 attention")
        else:
            dit_cfg = _dc.replace(dit_cfg, quant_attn="int8")
            logging.info("int8 qk^T self-attention enabled "
                         "(flash_attention qk_int8)")

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

    if mesh.devices.size > 1:
        # the reference's inference FSDP (fsdp.py:10-32 shard_model,
        # param_dtype=bf16): cast fp32 weights to bf16 and shard them over
        # ALL mesh axes — 14B bf16 replicated would not fit a 16 GB chip,
        # and sharded params also stop the sampling jit from embedding the
        # tree as HLO literals (the remote-compiler >100 MB upload limit)
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        with jax.set_mesh(mesh):
            params = jax.device_put(params,
                                    shd.fsdp_param_sharding(mesh, params))

    def load_or_zeros(path, shape):
        if path and os.path.exists(path):
            a = np.load(path)
            return jnp.asarray(a if a.ndim == 3 else a[None])
        return jnp.zeros(shape, jnp.float32)

    embed = _make_text_embedder(args, dit_cfg)
    from hyvideo_prfl_tpu.configs import SAMPLE_NEG_PROMPT

    neg_text = (args.negative_prompt if args.negative_prompt is not None
                else SAMPLE_NEG_PROMPT)
    ctx_null_cache = embed(neg_text) if embed else load_or_zeros(
        args.uncond_embeds, (1, dit_cfg.text_len, dit_cfg.text_dim))

    # record list: --prompt_file loop or the single CLI record
    if args.prompt_file:
        from hyvideo_prfl_tpu.data.dataset import EvalPromptDataset

        ds = EvalPromptDataset(args.prompt_file)
        records = [{"prompt": it.get("prompt", ""),
                    "image_path": it.get("image_path")}
                   for it in ds.items]
    else:
        records = [{"prompt": args.prompt, "image_path": args.image,
                    "last_image_path": args.last_image}]

    w, h = SIZE_CONFIGS[args.size]
    lat_f, lat_h, lat_w = latent_size_for(
        MAX_AREA_CONFIGS.get(args.size, w * h), h / w,
        num_frames=args.frame_num, sp_size=max(sp * ring, 1),
    )
    if args.smoke_tiny:
        lat_f, lat_h, lat_w = min(lat_f, 3), 8, 8
    gen = GenerateConfig(
        sampling_steps=args.sample_steps, shift=args.sample_shift,
        guide_scale=args.sample_guide_scale, sample_solver=args.sample_solver,
    )

    stem, ext = os.path.splitext(args.save_file)
    latents_out = []
    t2x = "t2v" in args.task or "t2i" in args.task
    with jax.set_mesh(mesh):
        if t2x:
            pipe = WanT2V(dit_cfg, params, policy)
        else:
            cls = WanFLF2V if "flf2v" in args.task else WanI2V
            pipe = cls(dit_cfg, params, policy)
        for idx, rec in enumerate(records):
            rng = jax.random.PRNGKey(args.base_seed + idx)
            if embed and rec.get("prompt"):
                ctx = embed(rec["prompt"])
            else:
                ctx = load_or_zeros(args.prompt_embeds,
                                    (1, dit_cfg.text_len, dit_cfg.text_dim))
            if t2x:
                if args.teacache_thresh is not None:
                    key = ("t2v-1.3b" if "1.3" in args.task.lower()
                           else "t2v-14b")
                    lat = pipe.sample_teacache(
                        rng, (1, lat_f, lat_h, lat_w, 16), ctx,
                        ctx_null_cache, gen, thresh=args.teacache_thresh,
                        coeffs_key=key)
                else:
                    lat = pipe.generate(rng, ctx, ctx_null_cache,
                                        lat_f, lat_h, lat_w, gen)
            else:
                if conditioner is not None and rec.get("image_path"):
                    clip, cond = conditioner(
                        rec["image_path"], rec.get("last_image_path"),
                        lat_f, lat_h, lat_w)
                else:
                    clip = load_or_zeros(args.clip_embeds, (1, 257, 1280))
                    cond = load_or_zeros(
                        args.cond_latent, (1, lat_f, lat_h, lat_w, 16))
                lat = pipe.generate(rng, ctx, ctx_null_cache, clip, cond,
                                    gen)
            # fetch the (small) latents to host EARLY (see CLAUDE.md: some
            # backends never release HBM in-process)
            latents_out.append(np.asarray(lat))
            logging.info("record %d/%d latents: %s", idx + 1,
                         len(records), lat.shape)

    # release the DiT before the decode phase (the reference's
    # offload_model=True teardown, text2video.py)
    del pipe
    params = None
    jax.clear_caches()
    import gc

    gc.collect()
    rc = 0
    for idx, lat in enumerate(latents_out):
        save_file = (args.save_file if len(latents_out) == 1
                     else f"{stem}_{idx:03d}{ext}")
        rc = _decode_and_write(lat, args, save_file) or rc
    return rc


if __name__ == "__main__":
    sys.exit(main())
