"""Latent-cache dataset, on-disk compatible with the reference.

Parity target: `diffusers_lite/datasets/image2video_dataset.py:19-348`
(Image2VideoTrainDataset) and the preprocess manifest format
(`scripts/preprocess/gen_wanx_latent.py:279-335`).

Disk format (unchanged, so caches interoperate both ways):
* a "meta list" text file of JSON paths, one per line
* each JSON holds npy paths: vae_latent_path [1,C,T,H,W] fp32,
  textshort_path/textlong_path [1,L,4096], imgclip_path [1,257,1280],
  f1_black_path [1,C,T,H,W] (first-frame conditioning latent), captions,
  and optional quality labels ("good"/"poor" or 0/1)
* NULL_DIR/wanx/{null,uncond,uncond_flf2v}.npy uncond text embeddings

TPU-native deltas: arrays are returned channel-last ([T,H,W,C] latents,
matching models/wan_dit.py) and text embeddings are padded to a fixed
text_len so every batch is a static shape.
"""

from __future__ import annotations

import functools
import json
import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np

NULL_DIR = "temp_data/null"  # constants.py:9
QUALITY_KEYS = (
    "text_alignment", "blur_quality", "physics_quality", "human_quality",
    "motion_quality",
)


def _load_npy(path):
    return np.load(path)


@functools.lru_cache(maxsize=8)
def _load_null_npy(path):
    """null/uncond text embeddings are re-read for EVERY sample in the
    reference; here they load once per process (they never change)."""
    return np.load(path)


def _to_thwc(lat_1cthw: np.ndarray) -> np.ndarray:
    """[1,C,T,H,W] (reference layout) -> [T,H,W,C]."""
    return np.transpose(lat_1cthw[0], (1, 2, 3, 0)).astype(np.float32)


def _pad_text(t: np.ndarray, text_len: int) -> np.ndarray:
    """[L,4096] -> [text_len,4096] zero-padded/truncated."""
    l, d = t.shape
    if l >= text_len:
        return t[:text_len].astype(np.float32)
    out = np.zeros((text_len, d), np.float32)
    out[:l] = t
    return out


def coerce_label(v) -> float:
    """'good'/'poor' or truthy -> 1.0/0.0 (image2video_dataset.py:256-263)."""
    if isinstance(v, str):
        return 1.0 if v.strip().lower() == "good" else 0.0
    return float(bool(v))


class LatentCacheDataset:
    """Map-style dataset over cached latents with 100-retry bad-data
    resampling (image2video_dataset.py:53-68)."""

    def __init__(
        self,
        dataset_type: str = "refl",  # refl | lrm_ce | lrm_bt_online
        meta_file_list: Sequence[str] = (),
        meta_file_lose_list: Sequence[str] = (),
        uncond_prob: Sequence[float] = (0.0, 0.0),
        text_len: int = 512,
        label_key: str = "motion_quality",
        null_dir: Optional[str] = None,
        long_caption_prob: float = 0.7,
        is_i2v: bool = True,
        is_flf2v: bool = False,
        seed: Optional[int] = None,
    ):
        self.dataset_type = dataset_type
        self.uncond_prompt_prob = uncond_prob[0]
        self.text_len = text_len
        self.label_key = label_key
        self.null_dir = null_dir or NULL_DIR
        self.long_caption_prob = long_caption_prob
        self.is_i2v = is_i2v
        self.is_flf2v = is_flf2v
        self.rng = random.Random(seed)
        # native C++ prefetch ring: a sample's npy files read in parallel
        # (data/native_loader.py); silently absent when the .so isn't built
        from .native_loader import NativeStream

        self._stream = NativeStream()

        self.meta_paths: List[str] = []
        for meta_file in meta_file_list:
            with open(meta_file) as f:
                self.meta_paths.extend(ln.strip() for ln in f if ln.strip())
        self.meta_paths_lose: List[str] = []
        for meta_file in meta_file_lose_list:
            with open(meta_file) as f:
                self.meta_paths_lose.extend(ln.strip() for ln in f if ln.strip())

    def __len__(self):
        return len(self.meta_paths)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if self.dataset_type not in ("refl", "lrm_ce", "lrm_bt_online"):
            raise ValueError(f"unknown dataset_type {self.dataset_type}")
        # retry a random other index on ANY per-sample failure (truncated
        # npy, bad JSON, missing file...) — the reference catches bare
        # Exception 100x (image2video_dataset.py:53-68)
        for _ in range(100):
            try:
                if self.dataset_type == "refl":
                    return self.get_refl(idx)
                if self.dataset_type == "lrm_ce":
                    return self.get_lrm_ce(idx)
                return self.get_lrm_bt_online(idx)
            except Exception as e:  # noqa: BLE001
                idx = self.rng.randrange(len(self.meta_paths))
                last = e
        raise RuntimeError(f"Too many bad data: {last}")

    # -- shared pieces ------------------------------------------------------

    def _read_meta(self, path: str) -> Dict:
        with open(path) as f:
            return json.load(f)

    def _latents(self, d: Dict) -> np.ndarray:
        for key in ("video_vae_latent_path", "vae_latent_path", "latents_path"):
            if key in d:
                return _to_thwc(_load_npy(d[key]))
        raise FileNotFoundError("no latent path key in meta")

    def _text(self, d: Dict, allow_long=True):
        if "textshort_path" in d and "textlong_path" in d:
            if allow_long and self.rng.random() <= self.long_caption_prob:
                return (_load_npy(d["textlong_path"])[0],
                        d.get("long_caption", ""))
            return (_load_npy(d["textshort_path"])[0],
                    d.get("short_caption", ""))
        return _load_npy(d["text_en_path"])[0], d.get("prompt", "")

    def _null_text(self, name: str) -> np.ndarray:
        return _load_null_npy(
            os.path.join(self.null_dir, f"wanx/{name}.npy"))[0]

    def _read_many(self, paths: List[Optional[str]]) -> List[Optional[np.ndarray]]:
        """Read several npys of one sample in parallel through the native
        ring (None entries pass through). numpy fallback when unbuilt."""
        real = [p for p in paths if p is not None]
        if self._stream.available() and len(real) > 1:
            arrs = iter(self._stream.read_many(real))
        else:
            arrs = iter([np.load(p) for p in real])
        return [next(arrs) if p is not None else None for p in paths]

    def _meta_paths_for(self, d: Dict, allow_long=True):
        """(latent_path, text_path|None, caption, cond_path, clip_path);
        text_path None means the caller substitutes a null embedding."""
        lat = next((d[k] for k in ("video_vae_latent_path",
                                   "vae_latent_path", "latents_path")
                    if k in d), None)
        if lat is None:
            raise FileNotFoundError("no latent path key in meta")
        if "textshort_path" in d and "textlong_path" in d:
            if allow_long and self.rng.random() <= self.long_caption_prob:
                text, cap = d["textlong_path"], d.get("long_caption", "")
            else:
                text, cap = d["textshort_path"], d.get("short_caption", "")
        else:
            text, cap = d["text_en_path"], d.get("prompt", "")
        cond = next((d[k] for k in ("f1_black_path", "latents_condition_path")
                     if k in d), None) if self.is_i2v else None
        clip = d.get("imgclip_path") if self.is_i2v else None
        return lat, text, cap, cond, clip

    def _cond(self, d: Dict) -> Optional[np.ndarray]:
        for key in ("f1_black_path", "latents_condition_path"):
            if key in d:
                return _to_thwc(_load_npy(d[key]))
        return None

    def _clip(self, d: Dict) -> Optional[np.ndarray]:
        if "imgclip_path" in d:
            e = _load_npy(d["imgclip_path"])  # [1,257,1280] or [b,s,d]
            return e.reshape(-1, e.shape[-1]).astype(np.float32)
        return None

    # -- getters ------------------------------------------------------------

    def get_refl(self, idx: int) -> Dict[str, np.ndarray]:
        """PRFL sample (get_batch_lrm_refl, image2video_dataset.py:70-129)."""
        d = self._read_meta(self.meta_paths[idx])
        lat_p, text_p, prompt, cond_p, clip_p = self._meta_paths_for(d)
        if self.rng.random() < self.uncond_prompt_prob:
            text_p = None
        lat, text, cond, clip = self._read_many(
            [lat_p, text_p, cond_p, clip_p])
        text = text[0] if text is not None else self._null_text("null")
        # flf2v tasks use their own uncond embedding file
        # (image2video_dataset.py:115-118)
        uncond_name = "uncond_flf2v" if self.is_flf2v else "uncond"
        out = {
            "latents": _to_thwc(lat),
            "text": _pad_text(text, self.text_len),
            "uncond_text": _pad_text(self._null_text(uncond_name),
                                     self.text_len),
            "prompt": prompt,
        }
        if cond is not None:
            out["cond"] = _to_thwc(cond)
        if clip is not None:
            out["clip_fea"] = clip.reshape(-1, clip.shape[-1]).astype(
                np.float32)
        return out

    def get_lrm_ce(self, idx: int) -> Dict[str, np.ndarray]:
        """Pointwise reward sample with quality label
        (get_batch_lrm_ce, image2video_dataset.py:184-266)."""
        d = self._read_meta(self.meta_paths[idx])
        out = self.get_refl_no_drop(idx)
        if self.label_key in d:
            out["labels"] = np.float32(coerce_label(d[self.label_key]))
        else:
            labels = {k: coerce_label(d[k]) for k in QUALITY_KEYS if k in d}
            if not labels:
                raise FileNotFoundError(f"no quality label in {self.meta_paths[idx]}")
            out["labels"] = np.float32(next(iter(labels.values())))
        return out

    def get_refl_no_drop(self, idx: int) -> Dict[str, np.ndarray]:
        d = self._read_meta(self.meta_paths[idx])
        lat_p, text_p, prompt, cond_p, clip_p = self._meta_paths_for(d)
        lat, text, cond, clip = self._read_many(
            [lat_p, text_p, cond_p, clip_p])
        out = {
            "latents": _to_thwc(lat),
            "text": _pad_text(text[0], self.text_len),
            "prompt": prompt,
        }
        if cond is not None:
            out["cond"] = _to_thwc(cond)
        if clip is not None:
            out["clip_fea"] = clip.reshape(-1, clip.shape[-1]).astype(
                np.float32)
        return out

    def get_lrm_bt_online(self, idx: int) -> Dict[str, np.ndarray]:
        """Pairwise sample: win = idx, lose = random from the lose list
        (get_batch_lrm_bt_online, image2video_dataset.py:268-348)."""
        win = self.get_refl_no_drop(idx)
        lose_idx = self.rng.randrange(len(self.meta_paths_lose))
        d_lose = self._read_meta(self.meta_paths_lose[lose_idx])
        win["latents_lose"] = self._latents(d_lose)
        cond_lose = self._cond(d_lose)
        if self.is_i2v and cond_lose is not None:
            win["cond_lose"] = cond_lose
        return win


class EvalPromptDataset:
    """Prompt(+image) list for inference runs.

    Parity target: Image2VideoEvalDataset (image2video_dataset.py:351-446):
    a txt file of prompts or a JSON list of {prompt|caption, image_path?}
    records; images resized aspect-preserving to 16-aligned dims.
    """

    def __init__(self, path: str, height: int = 480, width: int = 832):
        self.items: List[Dict] = []
        self.height = height
        self.width = width
        if path.endswith(".txt"):
            with open(path) as f:
                self.items = [{"prompt": ln.strip()} for ln in f if ln.strip()]
        else:
            with open(path) as f:
                data = json.load(f)
            for d in data:
                self.items.append({
                    "prompt": d.get("prompt") or d.get("caption")
                    or d.get("short_caption", ""),
                    "image_path": d.get("image_path") or d.get("img_path"),
                    **{k: v for k, v in d.items()
                       if k not in ("prompt", "caption")},
                })

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict:
        item = dict(self.items[idx])
        img_path = item.get("image_path")
        if img_path and os.path.exists(img_path):
            from PIL import Image

            img = Image.open(img_path).convert("RGB")
            w0, h0 = img.size
            scale = max(self.height / h0, self.width / w0)
            nw = int(round(w0 * scale / 16)) * 16
            nh = int(round(h0 * scale / 16)) * 16
            img = img.resize((nw, nh))
            arr = np.asarray(img, np.float32) / 127.5 - 1.0
            item["image"] = arr[:self.height, :self.width]
        return item
