"""Preprocess: video + captions -> latent cache (.npy + meta JSON).

Parity target: `scripts/preprocess/gen_wanx_latent.py` (main_wan, :261-335):
decode video on the host, fps-resample + 4n+1 align, resize/center-crop,
VAE-encode the clip and the first-frame-conditioned "f1_black" latent, CLIP
first-frame embedding, T5 short+long caption embeddings; write the same
.npy + *_meta_v1.json manifest the reference writes, so caches interoperate.

    python scripts/gen_latents.py --config configs/pre_480.yaml

Encoder weights are optional: without them this script exits with a clear
message (the training side can still run on caches produced by either
implementation).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hyvideo_prfl_tpu.configs import load_config
from hyvideo_prfl_tpu.models import clip as clip_mod
from hyvideo_prfl_tpu.models import vae as vae_mod
from hyvideo_prfl_tpu.utils.video_io import (
    read_video, resize_center_crop, target_size_for, to_model_range,
)


def encode_clip_data(vae, vae_params, clip_tower, clip_params, video_m1_1,
                     stream_over_frames: int = 33):
    """video [T,H,W,3] -> (latents [1,C,T',h,w], f1_black, img_clip).

    Long clips encode through the chunked streaming path (bounded memory,
    the reference's 1+4k feat_cache pattern, vae.py:517-543); short clips
    compile once whole-clip."""
    v = jnp.asarray(video_m1_1)[None]  # [1,T,H,W,3]
    if v.shape[1] > stream_over_frames:
        enc = lambda x: vae_mod.encode_streaming(vae_params, vae.cfg, x)
    else:
        enc = lambda x: vae.apply(vae_params, x, method=vae.encode)
    latents = enc(v)
    # first-frame conditioning: [first, zeros...] through the same encoder
    f1 = jnp.concatenate(
        [v[:, :1], jnp.zeros_like(v[:, 1:])], axis=1)
    f1_lat = enc(f1)
    img = clip_mod.preprocess_frames(np.asarray(v[0, :1]))
    img_clip = clip_tower.apply(clip_params, jnp.asarray(img))
    # to the reference [1, C, T, H, W] layout
    to_ref = lambda z: np.transpose(np.asarray(z), (0, 4, 1, 2, 3))
    return to_ref(latents), to_ref(f1_lat), np.asarray(img_clip)[None]


def resolve_config(config):
    """Accept BOTH config schemas: this framework's nested keys
    (extra_model.*.params_path, input_json, height/width) and the
    reference's flat preprocess YAML (configs/pre_{480,720}.yaml keys:
    json_path, vae_path, image_encoder_path, text_encoder_path,
    tokenizer_path, sample_n_frames, extract_fps, resolution [min_side] +
    aspect_ratio, start_idx — gen_wanx_latent.py args), so the reference's
    pre_*.yaml configs port verbatim."""
    get = config.get
    gp = config.get_path
    res = get("resolution")
    if isinstance(res, (list, tuple)):
        res = res[0] if res else None
    return dict(
        save_dir=get("save_dir", "latent_cache"),
        input_json=get("input_json") or get("json_path"),
        num_frames=int(get("num_frames") or get("sample_n_frames") or 81),
        fps=get("extract_fps") or get("fps") or 16,
        start_idx=int(get("start_idx") or 0),
        height=get("height"),
        width=get("width"),
        resolution=int(res) if res else None,
        aspect_ratio=float(get("aspect_ratio") or 1.81),
        vae_path=gp("extra_model.vae.params_path") or get("vae_path"),
        clip_path=(gp("extra_model.image_encoder.params_path")
                   or get("image_encoder_path")),
        t5_path=(gp("extra_model.text_encoder.params_path")
                 or get("text_encoder_path") or ""),
        tokenizer=(gp("extra_model.text_encoder.tokenizer")
                   or get("tokenizer_path") or "google/umt5-xxl"),
        text_len=int(gp("extra_model.text_encoder.t5_text_len")
                     or get("max_sequence_length") or 512),
    )


def _load_vae_params(path):
    """orbax dir or a released torch .pth (auto-converted in-memory)."""
    from hyvideo_prfl_tpu.utils import checkpoint as ck

    if path.endswith((".pth", ".pt")):
        from hyvideo_prfl_tpu.utils import convert_encoders as ce
        from scripts.convert_weights import _load_torch_state

        return ce.vae_torch_to_flax(_load_torch_state(path),
                                    vae_mod.VAEConfig())
    return ck.load_orbax(path)


def _load_clip_params(path):
    from hyvideo_prfl_tpu.utils import checkpoint as ck

    if path.endswith((".pth", ".pt")):
        from hyvideo_prfl_tpu.utils import convert_encoders as ce
        from scripts.convert_weights import _load_torch_state

        return ce.clip_torch_to_flax(_load_torch_state(path),
                                     clip_mod.vit_h_14())
    return ck.load_clip_visual(path)


def main(config):
    logging.basicConfig(level=logging.INFO)
    c = resolve_config(config)
    out_dir = c["save_dir"]
    lat_dir = os.path.join(out_dir, "latents")
    meta_dir = os.path.join(out_dir, "meta_v1")
    os.makedirs(lat_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    num_frames = c["num_frames"]
    fps = c["fps"]

    vae_path = c["vae_path"]
    if not vae_path or not os.path.exists(vae_path):
        logging.error(
            "VAE params not found (extra_model.vae.params_path / vae_path). "
            "Place converted encoder weights there to run preprocessing."
        )
        return 1

    vae_cfg = vae_mod.VAEConfig()
    vae = vae_mod.WanVAE(vae_cfg)
    vae_params = _load_vae_params(vae_path)
    clip_cfg = clip_mod.vit_h_14()
    clip_tower = clip_mod.CLIPVisionTower(clip_cfg)
    clip_params = _load_clip_params(c["clip_path"])

    # single-pass preprocess (reference gen_wanx_latent.py:301-309): T5
    # captions encode in the same run when weights are configured;
    # otherwise encode_captions.py fills the manifests in later
    from scripts.encode_captions import make_t5_embedder

    embed = make_t5_embedder(c["t5_path"], c["tokenizer"], c["text_len"])

    with open(c["input_json"]) as f:
        data = json.load(f)

    for clip_data in data:
        base = clip_data["source_id"]
        meta_path = os.path.join(meta_dir, f"{base}_meta_v1.json")
        if os.path.isfile(meta_path):
            logging.info("already processed: %s", meta_path)
            continue
        try:
            frames, _ = read_video(clip_data["video_path"],
                                   num_frames=num_frames, target_fps=fps,
                                   start_frame=c["start_idx"])
            if c["resolution"]:
                # reference sizing: per-clip aspect, min side = resolution,
                # 32-aligned, capped (gen_wanx_latent.py:117-149)
                height, width = target_size_for(
                    frames.shape[1], frames.shape[2],
                    c["resolution"], c["aspect_ratio"])
            else:
                height = int(c["height"] or 480)
                width = int(c["width"] or 832)
            frames = resize_center_crop(frames, height, width)
            video = to_model_range(frames)
            latents, f1_lat, img_clip = encode_clip_data(
                vae, vae_params, clip_tower, clip_params, video)
            paths = {
                "vae_latent_path": os.path.join(lat_dir, f"{base}.npy"),
                "f1_black_path": os.path.join(lat_dir, f"{base}_f1_black.npy"),
                "imgclip_path": os.path.join(lat_dir, f"{base}_img_clip.npy"),
                "textshort_path": os.path.join(lat_dir, f"{base}_textshort.npy"),
                "textlong_path": os.path.join(lat_dir, f"{base}_textlong.npy"),
            }
            np.save(paths["vae_latent_path"], latents)
            np.save(paths["f1_black_path"], f1_lat)
            np.save(paths["imgclip_path"], img_clip)
            if embed is not None:
                np.save(paths["textshort_path"],
                        embed(clip_data.get("short_caption", "")))
                np.save(paths["textlong_path"],
                        embed(clip_data.get(
                            "long_caption",
                            clip_data.get("short_caption", ""))))
            else:
                # T5 embeddings need the text tower + tokenizer assets;
                # encode_captions.py fills them in when those exist
                paths.pop("textshort_path")
                paths.pop("textlong_path")
            meta = dict(clip_data)
            meta.update(paths)
            meta["latent_shape"] = list(latents.shape)
            with open(meta_path, "w") as f:
                json.dump(meta, f, indent=2, ensure_ascii=False)
            logging.info("processed %s", base)
        except Exception as e:  # noqa: BLE001 (reference continues on error)
            logging.exception("failed on %s: %s", base, e)
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    args = p.parse_args()
    sys.exit(main(load_config(args.config)))
