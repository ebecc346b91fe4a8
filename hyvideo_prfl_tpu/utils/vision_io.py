"""Vision input helpers for the VL prompt expander.

Parity target: reference `wan/utils/qwen_vl_utils.py` (fetch_image /
smart_resize / fetch_video — the vision-IO layer feeding Qwen2.5-VL prompt
extension). Re-implemented compactly: accepts PIL images, file paths,
file:// URIs, http(s) URLs, data:image base64 URIs, and numpy arrays;
resizes to factor-aligned dimensions within [min_pixels, max_pixels]
(the Qwen-VL processor contract: both sides multiples of 28).
"""

from __future__ import annotations

import base64
import io
import math
from typing import Union

import numpy as np

IMAGE_FACTOR = 28
MIN_PIXELS = 4 * 28 * 28
MAX_PIXELS = 16384 * 28 * 28
MAX_RATIO = 200
FRAME_FACTOR = 2


def round_by_factor(n: float, factor: int) -> int:
    return round(n / factor) * factor


def ceil_by_factor(n: float, factor: int) -> int:
    return math.ceil(n / factor) * factor


def floor_by_factor(n: float, factor: int) -> int:
    return math.floor(n / factor) * factor


def smart_resize(height: int, width: int, factor: int = IMAGE_FACTOR,
                 min_pixels: int = MIN_PIXELS,
                 max_pixels: int = MAX_PIXELS) -> tuple:
    """(h, w) rescaled so both are factor-multiples, the pixel count lies
    in [min_pixels, max_pixels], and aspect is (nearly) preserved."""
    if max(height, width) / min(height, width) > MAX_RATIO:
        raise ValueError(
            f"aspect ratio must be < {MAX_RATIO}, got "
            f"{max(height, width) / min(height, width)}")
    h_bar = max(factor, round_by_factor(height, factor))
    w_bar = max(factor, round_by_factor(width, factor))
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, floor_by_factor(height / beta, factor))
        w_bar = max(factor, floor_by_factor(width / beta, factor))
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = ceil_by_factor(height * beta, factor)
        w_bar = ceil_by_factor(width * beta, factor)
    return h_bar, w_bar


def fetch_image(image: Union[str, "np.ndarray", object],
                size_factor: int = IMAGE_FACTOR,
                min_pixels: int = MIN_PIXELS,
                max_pixels: int = MAX_PIXELS,
                resize: bool = True):
    """Any image reference -> RGB PIL.Image (smart-resized for the VL
    processor unless resize=False). Accepts PIL, numpy [H, W, 3] (uint8 or
    [-1, 1] float), local paths, file:// URIs, http(s) URLs, data:image
    base64."""
    from PIL import Image

    if isinstance(image, np.ndarray):
        arr = image
        if arr.dtype != np.uint8:
            arr = ((np.clip(arr, -1, 1) + 1) * 127.5).astype(np.uint8)
        img = Image.fromarray(arr)
    elif isinstance(image, str):
        if image.startswith(("http://", "https://")):
            import urllib.request

            with urllib.request.urlopen(image, timeout=30) as r:
                img = Image.open(io.BytesIO(r.read()))
        elif image.startswith("file://"):
            img = Image.open(image[7:])
        elif image.startswith("data:image"):
            if "base64," not in image:
                raise ValueError("data URI must be base64-encoded")
            _, b64 = image.split("base64,", 1)
            img = Image.open(io.BytesIO(base64.b64decode(b64)))
        else:
            img = Image.open(image)
    else:
        img = image  # PIL already
    img = img.convert("RGB")
    if not resize:
        return img
    h, w = smart_resize(img.height, img.width, factor=size_factor,
                        min_pixels=min_pixels, max_pixels=max_pixels)
    return img.resize((w, h))


def fetch_video_frames(path: str, nframes: int = 16,
                       frame_factor: int = FRAME_FACTOR) -> np.ndarray:
    """Uniformly sample `nframes` (rounded to frame_factor) RGB frames from
    a video file -> [N, H, W, 3] uint8 (host decode, utils/video_io.py
    backends)."""
    from .video_io import read_video

    frames = read_video(path)  # [T, H, W, 3]
    n = max(frame_factor, round_by_factor(nframes, frame_factor))
    n = min(n, len(frames))
    idx = np.linspace(0, len(frames) - 1, n).round().astype(int)
    return np.asarray(frames)[idx]
