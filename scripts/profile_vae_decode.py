"""Real-chip timing of the streaming VAE decode at the serving shape.

The serving chain's once-per-clip tail: 720p x 81f means decoding
[1, 21, 90, 160, 16] latents into [1, 81, 720, 1280, 3] pixels through
the causal 3D decoder (models/vae.decode_streaming — the reference's
chunked feat_cache path, vae.py:545-569). Two configurations measured:

  * full-clip single chip, bf16 stream + host_stream — the fp32 stream
    needs ~16 GB (8.4 GB caches + 7.3 GB temps; measured OOM on the
    16 GB chip), the bf16 stream halves it; this is the configuration
    scripts/decode_latents.py auto-selects at this shape.
  * W/8 latent slice [1, 21, 90, 20, 16], fp32 and bf16 — the per-device
    proxy of the 8-chip spatial-sharded decode (VAEConfig.spatial_shard
    W-sharding; conv halo exchange is a few rows per chunk, negligible
    wire) — the production serving tail on the same 8 x v5e slice that
    ran the sampling chain.

Wall time per chunk loop is measured as dispatches + one final scalar
fetch (the fetch waits for the whole device queue — the CLAUDE.md-safe
pattern). Rows consumed by BENCH_SERVING.json as vae_decode_*
(re-run scripts/estimate_serving.py --recompose after, or patch by hand).
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
import numpy as np

from hyvideo_prfl_tpu.models import vae as vae_mod

LAT_FULL = (1, 21, 90, 160, 16)   # 720p x 81f latents, whole clip
LAT_SHARD = (1, 21, 90, 20, 16)   # W/8 per-device slice of the same


def time_decode(tag, params, cfg, z, dtype, host_stream, n=2):
    t0 = time.perf_counter()
    y = vae_mod.decode_streaming(params, cfg, z, frames_per_chunk=1,
                                 dtype=dtype, host_stream=host_stream)
    s0 = float(np.sum(np.asarray(y)[:, -1, ::64, ::64]))
    compile_s = time.perf_counter() - t0
    del y

    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        y = vae_mod.decode_streaming(params, cfg, z, frames_per_chunk=1,
                                     dtype=dtype, host_stream=host_stream)
        s1 = float(np.sum(np.asarray(y)[:, -1, ::64, ::64]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        del y
    assert s1 == s0
    print(json.dumps({"tag": tag, "s": round(best, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return best


def main():
    cfg = vae_mod.VAEConfig()  # released shape: dim 96, z 16, 3 stages
    params = vae_mod.init_vae_params(cfg, jax.random.PRNGKey(0))
    out = {}

    # per-device proxy of the 8-chip W-sharded serving decode
    z_s = jax.random.normal(jax.random.PRNGKey(1), LAT_SHARD,
                            jnp.float32) * 0.5
    out["decode_720p81f_Wshard8_dev_fp32_s"] = round(
        time_decode("Wshard8_dev_fp32", params, cfg, z_s,
                    jnp.float32, False), 2)
    out["decode_720p81f_Wshard8_dev_bf16_s"] = round(
        time_decode("Wshard8_dev_bf16", params, cfg, z_s,
                    jnp.bfloat16, False), 2)
    del z_s

    # full clip on ONE 16 GB chip: bf16 + host_stream (fp32 OOMs)
    z = jax.random.normal(jax.random.PRNGKey(1), LAT_FULL, jnp.float32) * 0.5
    out["decode_720p81f_1chip_bf16_hoststream_s"] = round(
        time_decode("full_1chip_bf16_hoststream", params, cfg, z,
                    jnp.bfloat16, True), 2)

    out["shape"] = list(LAT_FULL)
    print(json.dumps(out), flush=True)

    # fold the rows into BENCH_SERVING.json (estimate_serving.py preserves
    # the key across --recompose and publishes the end-to-end tail).
    # Same path override as estimate_serving.py so redirected runs stay
    # redirected; create the file with just the vae_decode key if absent.
    bench_path = os.environ.get("HYV_BENCH_SERVING_PATH") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SERVING.json")
    bench = {}
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            bench = json.load(f)
    else:
        print(json.dumps({"notice": f"{bench_path} absent; creating it "
                          "with the vae_decode rows only"}), flush=True)
    bench["vae_decode"] = out
    with open(bench_path, "w") as f:
        json.dump(bench, f, indent=2)
    print(json.dumps({"updated": bench_path}), flush=True)


if __name__ == "__main__":
    main()
