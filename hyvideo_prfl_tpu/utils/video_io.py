"""Video IO: mp4 read/write on the host.

Parity target: `wan/utils/utils.py:24-90` (cache_video/cache_image with
retry), `utils/data_utils.py:284-297` (save_videos_grid), and the decord
read path of the preprocess pipeline (gen_wanx_latent.py:67-115). decord is
not in this image; imageio(-ffmpeg)/OpenCV cover decode+encode on CPU.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Optional, Tuple

import numpy as np


def read_video(path: str, num_frames: Optional[int] = None,
               target_fps: Optional[float] = None,
               start_frame: int = 0) -> Tuple[np.ndarray, float]:
    """mp4 (local path or http(s) URL) -> ([T, H, W, 3] uint8, fps), with
    optional fps resampling and 4n+1 frame alignment
    (gen_wanx_latent.py:66-72 URL fetch, :98-115, :196-197).
    start_frame: skip this many source frames before resampling (the
    reference's `start_idx`, gen_wanx_latent.py:104)."""
    import imageio.v3 as iio

    src = path
    if path.startswith(("http://", "https://")):
        # the reference streams remote videos through urllib into the
        # decoder (gen_wanx_latent.py:66-72)
        import urllib.request

        with urllib.request.urlopen(
                urllib.request.Request(path), timeout=20) as resp:
            src = resp.read()  # bytes; imageio decodes in-memory
    try:
        frames = iio.imread(src, plugin="pyav", extension=".mp4"
                            if isinstance(src, bytes) else None)  # [T,H,W,3]
        try:
            meta = iio.immeta(src, plugin="pyav")
            fps = float(meta.get("fps", 30.0))
        except Exception:
            fps = 30.0
    except ImportError:
        # pyav absent: decode through OpenCV (mirrors cache_video's cv2
        # writer fallback; URL sources spill to a temp file for cv2)
        frames, fps = _read_video_cv2(src)
    if start_frame:
        frames = frames[start_frame:]
    if target_fps and abs(target_fps - fps) > 1e-3:
        idx = np.arange(0, len(frames), fps / target_fps).astype(np.int64)
        idx = idx[idx < len(frames)]
        frames = frames[idx]
        fps = target_fps
    if num_frames is not None:
        frames = frames[:num_frames]
    # align to 4n+1 frames (VAE stride-4 chunking contract)
    t = len(frames)
    t_aligned = (t - 1) // 4 * 4 + 1
    return np.asarray(frames[:t_aligned]), fps


def _read_video_cv2(src) -> Tuple[np.ndarray, float]:
    """cv2.VideoCapture decode: src is a path or in-memory mp4 bytes."""
    import tempfile

    import cv2

    tmp = None
    path = src
    if isinstance(src, bytes):
        tmp = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
        tmp.write(src)
        tmp.close()
        path = tmp.name
    try:
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise IOError(f"cv2 cannot open video: {path}")
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        if not frames:
            raise IOError(f"no frames decoded from {path}")
        return np.stack(frames), float(fps)
    finally:
        if tmp is not None:
            os.unlink(tmp.name)


def target_size_for(h: int, w: int, resolution: int, aspect_ratio: float
                    ) -> Tuple[int, int]:
    """(height, width) target for a clip of source size (h, w), matching
    the reference's height_width_scale (gen_wanx_latent.py:117-149):
    scale the short side to `resolution`, 32-align-ceil both dims, cap
    each at ceil32(resolution * aspect_ratio)."""
    ceil32 = lambda v: int(-(-int(v) // 32) * 32)
    scale = resolution / min(h, w)
    rh, rw = ceil32(int(h * scale)), ceil32(int(w * scale))
    max_r = ceil32(resolution * aspect_ratio)
    return min(rh, max_r), min(rw, max_r)


def resize_center_crop(frames: np.ndarray, height: int, width: int
                       ) -> np.ndarray:
    """Aspect-preserving resize + center crop to (H, W), 32-aligned targets
    (gen_wanx_latent.py:117-149)."""
    import cv2

    t, h, w, _ = frames.shape
    scale = max(height / h, width / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = np.empty((t, height, width, 3), frames.dtype)
    y0 = (nh - height) // 2
    x0 = (nw - width) // 2
    for i in range(t):
        r = cv2.resize(frames[i], (nw, nh), interpolation=cv2.INTER_AREA)
        out[i] = r[y0:y0 + height, x0:x0 + width]
    return out


def to_model_range(frames_uint8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> fp32 [-1,1]."""
    return frames_uint8.astype(np.float32) / 127.5 - 1.0


def cache_video(video_m1_1: np.ndarray, path: str, fps: int = 15,
                retry: int = 5) -> Optional[str]:
    """[T, H, W, 3] in [-1,1] -> mp4 with retries (utils.py:24-58)."""
    import imageio

    frames = ((np.clip(video_m1_1, -1, 1) + 1.0) * 127.5).astype(np.uint8)
    for attempt in range(retry):
        try:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with imageio.get_writer(path, fps=fps, codec="libx264",
                                    quality=8) as w:
                for f in frames:
                    w.append_data(f)
            return path
        except Exception as e:  # noqa: BLE001
            logging.warning("cache_video attempt %d failed: %s", attempt, e)
            break  # missing codec backend fails identically every retry
    # imageio needs an ffmpeg/pyav backend for mp4; cv2 ships its own
    # codecs — use it as the writer fallback (air-gapped images)
    try:
        import cv2

        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return path
    except Exception as e:  # noqa: BLE001
        logging.warning("cache_video cv2 fallback failed: %s", e)
    return None


def save_videos_grid(videos: np.ndarray, path: str, fps: int = 15,
                     n_rows: Optional[int] = None, rescale: bool = True
                     ) -> Optional[str]:
    """[B, T, H, W, 3] -> one grid mp4 (data_utils.py:284-297)."""
    b, t, h, w, c = videos.shape
    n_rows = n_rows or int(math.ceil(math.sqrt(b)))
    n_cols = int(math.ceil(b / n_rows))
    grid = np.zeros((t, n_rows * h, n_cols * w, c), np.float32)
    for i in range(b):
        r, col = divmod(i, n_cols)
        grid[:, r * h:(r + 1) * h, col * w:(col + 1) * w] = videos[i]
    if not rescale:
        grid = grid * 2.0 - 1.0
    return cache_video(grid, path, fps=fps)


def cache_image(image_m1_1: np.ndarray, path: str) -> Optional[str]:
    """[H, W, 3] in [-1,1] -> image file (utils.py:60-90)."""
    import imageio

    img = ((np.clip(image_m1_1, -1, 1) + 1.0) * 127.5).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, img)
    return path
