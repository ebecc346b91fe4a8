"""Generate a tiny synthetic latent cache for smoke runs.

The reference ships temp_data/ fixtures (3 mp4s + precomputed null/uncond
embeddings, SURVEY.md section 4) so training runs without real data; this is
our equivalent, writing the same meta-JSON/.npy format at toy shapes.

    python scripts/make_smoke_data.py --out temp_data_smoke [--text-dim 64]
"""

import argparse
import json
import os

import numpy as np


def main(out, n=6, c=16, t=3, h=8, w=8, text_dim=4096, clip_dim=1280,
         seed=0):
    rng = np.random.RandomState(seed)
    lat_dir = os.path.join(out, "latents")
    meta_dir = os.path.join(out, "meta")
    null_dir = os.path.join(out, "null", "wanx")
    for d in (lat_dir, meta_dir, null_dir):
        os.makedirs(d, exist_ok=True)
    np.save(os.path.join(null_dir, "null.npy"),
            np.zeros((1, 1, text_dim), np.float32))
    np.save(os.path.join(null_dir, "uncond.npy"),
            rng.randn(1, 20, text_dim).astype(np.float32))
    np.save(os.path.join(null_dir, "uncond_flf2v.npy"),
            rng.randn(1, 20, text_dim).astype(np.float32))

    metas = []
    for i in range(n):
        base = f"smoke{i}"
        lat = rng.randn(1, c, t, h, w).astype(np.float32)
        paths = {
            "vae_latent_path": os.path.join(lat_dir, f"{base}.npy"),
            "f1_black_path": os.path.join(lat_dir, f"{base}_f1_black.npy"),
            "imgclip_path": os.path.join(lat_dir, f"{base}_img_clip.npy"),
            "textshort_path": os.path.join(lat_dir, f"{base}_textshort.npy"),
            "textlong_path": os.path.join(lat_dir, f"{base}_textlong.npy"),
        }
        np.save(paths["vae_latent_path"], lat)
        np.save(paths["f1_black_path"], lat * 0.5)
        np.save(paths["imgclip_path"],
                rng.randn(1, 257, clip_dim).astype(np.float32))
        np.save(paths["textshort_path"],
                rng.randn(1, 10, text_dim).astype(np.float32))
        np.save(paths["textlong_path"],
                rng.randn(1, 30, text_dim).astype(np.float32))
        meta = {
            "source_id": base,
            "short_caption": f"smoke clip {i}",
            "long_caption": f"a longer smoke caption for clip {i}",
            "motion_quality": "good" if i % 2 == 0 else "poor",
            **paths,
        }
        mpath = os.path.join(meta_dir, f"{base}_meta_v1.json")
        with open(mpath, "w") as f:
            json.dump(meta, f, indent=2)
        metas.append(mpath)

    list_path = os.path.join(out, "smoke.list")
    with open(list_path, "w") as f:
        f.write("\n".join(metas) + "\n")
    print(f"wrote {n} samples under {out}; list: {list_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="temp_data_smoke")
    p.add_argument("--n", type=int, default=6)
    p.add_argument("--text-dim", type=int, default=4096)
    args = p.parse_args()
    main(args.out, n=args.n, text_dim=args.text_dim)
