"""Real-chip timing of the streaming VAE decode at the serving shape.

The serving chain's once-per-clip tail: 720p x 81f means decoding
[1, 21, 90, 160, 16] latents into [1, 81, 720, 1280, 3] pixels through
the causal 3D decoder (models/vae.decode_streaming — the reference's
chunked feat_cache path, vae.py:545-569). This measures it end-to-end on
the chip: one warm-up pass compiles the 2-3 chunk variants, then a full
second decode is timed as the dispatch loop + one final scalar fetch
(per-chunk dispatch is ~0.7 ms; the fetch waits for the whole queue, so
the wall covers all chunks' device time — the CLAUDE.md-safe pattern).

Row consumed by BENCH_SERVING.json as vae_decode_720p81f_s (run this,
then re-run scripts/estimate_serving.py, or patch the JSON by hand).
Fresh process per run: the axon backend does not reliably release HBM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models import vae as vae_mod

LAT = (1, 21, 90, 160, 16)  # 720p x 81f latents
CHUNKS = (1, 2)             # latent frames per steady chunk


def main():
    cfg = vae_mod.VAEConfig()  # released shape: dim 96, z 16, 3 stages
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), LAT, jnp.float32) * 0.5

    out = {}
    for fpc in CHUNKS:
        # warm-up: compiles first/steady/tail chunk variants
        t0 = time.perf_counter()
        y = vae_mod.decode_streaming(params, cfg, z, frames_per_chunk=fpc)
        s0 = float(jnp.sum(y[:, -1, ::64, ::64]))
        compile_s = time.perf_counter() - t0
        del y

        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            y = vae_mod.decode_streaming(params, cfg, z,
                                         frames_per_chunk=fpc)
            s1 = float(jnp.sum(y[:, -1, ::64, ::64]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            del y
        assert s1 == s0
        out[f"decode_720p81f_chunk{fpc}_s"] = round(best, 2)
        print(json.dumps({"frames_per_chunk": fpc, "s": round(best, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    out["shape"] = list(LAT)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
