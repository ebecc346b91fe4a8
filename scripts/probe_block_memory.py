"""Real-chip memory probe for the fused-kernel 14B block step (VERDICT r2
item 7). device.memory_stats() is None on the axon backend, so peak HBM is
measured by EMPIRICAL BISECTION (the CLAUDE.md prescription): allocate a
ballast buffer of --ballast_gb, then run one 14B-dimension block
forward+backward (18,900 tokens, fused qknorm_rope + Mosaic flash, the
"attn" remat policy) and report success/OOM. The driver loop
(--bisect lo hi) runs each trial in a FRESH subprocess (an OOM poisons the
process heap on this backend) and brackets the peak:

    peak ~= HBM_total - max_ballast_that_fits

Single-trial usage:   python scripts/probe_block_memory.py --ballast_gb 8
Bisection driver:     python scripts/probe_block_memory.py --bisect 4 12
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, HEADS, FFN = 5120, 40, 13824
GRID = (21, 45, 20)
L = GRID[0] * GRID[1] * GRID[2]


def trial(ballast_gb: float) -> int:
    import jax
    import jax.numpy as jnp

    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.models.rope import rope_tables_rolled

    n = int(ballast_gb * (1 << 30) / 4)
    ballast = jnp.ones((n,), jnp.float32)
    print(f"ballast {ballast_gb} GB allocated: {float(ballast[0])}",
          flush=True)

    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=1, remat=False)
    blk = wan_dit.WanBlock(cfg)
    cos, sin = rope_tables_rolled(GRID, cfg.head_dim)
    x = jnp.ones((1, L, DIM), jnp.float32) * 0.1
    ctx = jnp.ones((1, 512, DIM), jnp.bfloat16) * 0.1
    e6 = jnp.ones((1, 6, DIM), jnp.float32) * 0.1
    params = blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos, sin)

    @jax.jit
    def grad1(p, x):
        def loss(p):
            f = lambda x: blk.apply(p, x, e6, ctx, cos, sin).astype(x.dtype)
            y = jax.checkpoint(
                f, policy=wan_dit._attn_saveable_policy)(x)
            return jnp.sum(y)
        g = jax.grad(loss)(p)
        return sum(jnp.sum(v) for v in jax.tree.leaves(g))

    v = float(grad1(params, x))
    print(f"OK ballast={ballast_gb} grad_sum={v:.3e}", flush=True)
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ballast_gb", type=float, default=None)
    p.add_argument("--bisect", nargs=2, type=float, default=None,
                   metavar=("LO", "HI"))
    p.add_argument("--hbm_gb", type=float, default=16.0)
    p.add_argument("--tol_gb", type=float, default=1.0)
    args = p.parse_args()

    if args.ballast_gb is not None:
        return trial(args.ballast_gb)

    lo, hi = args.bisect or (4.0, 12.0)
    # invariant: lo fits (to be verified), hi OOMs (to be verified)
    results = {}

    def run(gb):
        if gb in results:
            return results[gb]
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--ballast_gb", str(gb)],
            capture_output=True, text=True, timeout=3600)
        ok = r.returncode == 0 and f"OK ballast={gb}" in r.stdout
        print(json.dumps({"ballast_gb": gb, "fits": ok,
                          "tail": (r.stdout + r.stderr)[-200:].replace(
                              "\n", " ")}), flush=True)
        results[gb] = ok
        return ok

    if not run(lo):
        print(json.dumps({"error": f"lo={lo} GB already OOMs"}))
        return 1
    while run(hi):
        hi += 2.0
        if hi > args.hbm_gb:
            print(json.dumps({"note": "never OOMed below HBM size",
                              "peak_gb_upper": args.hbm_gb - hi + 2.0}))
            return 0
    while hi - lo > args.tol_gb:
        mid = round((lo + hi) / 2, 1)
        if run(mid):
            lo = mid
        else:
            hi = mid
    print(json.dumps({
        "max_ballast_fits_gb": lo,
        "min_ballast_oom_gb": hi,
        "block_step_peak_gb": [round(args.hbm_gb - hi, 1),
                               round(args.hbm_gb - lo, 1)],
        "note": "14B-dim block fwd+bwd, fused kernels, attn remat policy, "
                "18900 tokens",
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
