"""Preprocess-surface tests: reference config schema (configs/pre_*.yaml),
per-clip sizing math, and start_idx frame offsets.

Parity targets: /root/reference/scripts/preprocess/gen_wanx_latent.py
height_width_scale (:117-149), extract_video_frames start_idx (:104),
and the configs/pre_{480,720}.yaml flat-key schema.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyvideo_prfl_tpu.utils.video_io import target_size_for

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_target_size_for_reference_math():
    # landscape 720p source at the pre_720 settings: short side -> 704,
    # long side 1251 -> ceil32 1280, cap ceil32(704*1.81)=1280
    assert target_size_for(720, 1280, 704, 1.81) == (704, 1280)
    # portrait swaps the roles
    assert target_size_for(1280, 720, 704, 1.81) == (1280, 704)
    # square at the pre_480 settings: 480-aligned, far below the cap
    assert target_size_for(512, 512, 480, 1.73) == (480, 480)
    # extreme aspect hits the cap on the long side
    h, w = target_size_for(480, 4000, 480, 1.73)
    assert h == 480 and w == -(-int(480 * 1.73) // 32) * 32


def test_resolve_config_reference_schema():
    from hyvideo_prfl_tpu.configs import load_config
    from scripts.gen_latents import resolve_config

    c = resolve_config(load_config(os.path.join(REPO, "configs/pre_720.yaml")))
    assert c["input_json"] == "temp_data/temp_input_data.json"
    assert c["resolution"] == 704 and c["aspect_ratio"] == 1.81
    assert c["num_frames"] == 81 and c["fps"] == 16 and c["start_idx"] == 0
    assert c["vae_path"].endswith("Wan2.1_VAE.pth")
    assert c["clip_path"].endswith(".pth")
    assert c["t5_path"].endswith(".pth")
    assert c["tokenizer"].endswith("google/umt5-xxl")
    assert c["text_len"] == 512
    assert c["save_dir"] == "temp_data/720"


def test_resolve_config_native_schema(tmp_path):
    from hyvideo_prfl_tpu.configs import load_config
    from scripts.gen_latents import resolve_config

    yaml_path = tmp_path / "pre.yaml"
    yaml_path.write_text(
        "input_json: data.json\n"
        "height: 480\nwidth: 832\nnum_frames: 17\nfps: 8\n"
        "extra_model:\n"
        "  vae: {params_path: w/vae}\n"
        "  image_encoder: {params_path: w/clip}\n"
        "  text_encoder: {params_path: w/t5, tokenizer: tok, t5_text_len: 256}\n"
    )
    c = resolve_config(load_config(str(yaml_path)))
    assert c["input_json"] == "data.json"
    assert c["resolution"] is None  # fixed H/W mode
    assert (c["height"], c["width"]) == (480, 832)
    assert c["num_frames"] == 17 and c["fps"] == 8
    assert c["vae_path"] == "w/vae" and c["clip_path"] == "w/clip"
    assert c["t5_path"] == "w/t5" and c["tokenizer"] == "tok"
    assert c["text_len"] == 256


def test_read_video_start_frame(tmp_path):
    from hyvideo_prfl_tpu.utils.video_io import cache_video, read_video

    # 13 solid-gray frames with distinct, codec-robust levels
    levels = np.linspace(-0.9, 0.9, 13, dtype=np.float32)
    vid = np.broadcast_to(
        levels[:, None, None, None], (13, 64, 64, 3)).copy()
    path = str(tmp_path / "clip.mp4")
    if cache_video(vid, path, fps=8) is None:
        pytest.skip("no mp4 writer backend available")

    full, _ = read_video(path)
    off, _ = read_video(path, start_frame=4)
    assert len(off) == len(full) - 4 or len(off) % 4 == 1  # 4n+1 realign
    a = full[4:4 + len(off)].mean(axis=(1, 2, 3))
    b = off.mean(axis=(1, 2, 3))
    np.testing.assert_allclose(a, b, atol=3.0)  # codec tolerance
