"""Cross-attention backend A/B at the 14B per-device shape.

The composed 14B estimate (scripts/estimate_14b_step.py) charges 25.1 ms
to cross-attention per block forward — ~88 TF/s for its ~2.2 TFLOP, the
least efficient dense component. Hypothesis: the XLA einsum path's fp32
logits ([1, 40, 18900, 512] = 1.55 GB) round-trip HBM for the softmax;
the Pallas flash kernel at lk=512 runs a single full-K block with logits
resident in VMEM. This script measures the CrossAttention module fwd and
fwd+bwd under backend=xla vs backend=flash on the real chip, and prints
the max |delta| between the two outputs (both bf16 kernels, fp32 softmax).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyvideo_prfl_tpu.models import wan_dit
from hyvideo_prfl_tpu.ops import attention

DIM, HEADS, FFN = 5120, 40, 13824
L = int(sys.argv[1]) if len(sys.argv) > 1 else 18900
LCTX = 512
K = 3


def timeit(tag, fn, *args, n=3):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(json.dumps({"tag": tag, "s": round(best, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return best


def main():
    rng = jax.random.PRNGKey(0)
    cfg = wan_dit.WanConfig(model_type="t2v", dim=DIM, ffn_dim=FFN,
                            num_heads=HEADS, num_layers=1)
    x = jax.random.normal(rng, (1, L, DIM), jnp.float32) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, LCTX, DIM),
                            jnp.bfloat16) * 0.1

    ca = wan_dit.CrossAttention(cfg)
    ca_p = ca.init(rng, x, ctx)

    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    rt = timeit("roundtrip", trivial, jnp.zeros((8, 128)))

    results = {}
    # FLOPs: q o projections 2*2*L*D^2, k v 2*2*Lk*D^2, attn 2*2*L*Lk*D
    fl = (4.0 * L * DIM * DIM + 4.0 * LCTX * DIM * DIM
          + 4.0 * L * LCTX * DIM)

    for backend in ("xla", "flash"):
        attention.set_default_backend(backend)

        @jax.jit
        def fwdK(p, x):
            def body(x, _):
                return ca.apply(p, x, ctx).astype(x.dtype), None
            x, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(x.astype(jnp.float32))

        t_f = (timeit(f"{backend}_fwd", fwdK, ca_p, x) - rt) / K

        @jax.jit
        def gradK(p, x):
            def loss(x):
                def body(x, _):
                    return ca.apply(p, x, ctx).astype(x.dtype), None
                y, _ = jax.lax.scan(body, x, None, length=K)
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(loss)(x).ravel()[0]

        t_g = (timeit(f"{backend}_fwdbwd", gradK, ca_p, x) - rt) / K
        results[backend] = {
            "fwd_ms": round(t_f * 1e3, 2),
            "fwd_tflops": round(fl / t_f / 1e12, 1),
            "fwdbwd_ms": round(t_g * 1e3, 2),
        }
        attention.set_default_backend("auto")

    # numerics: one un-scanned forward per backend, compare on host
    outs = {}
    for backend in ("xla", "flash"):
        attention.set_default_backend(backend)
        y = jax.jit(lambda p, x: ca.apply(p, x, ctx))(ca_p, x)
        outs[backend] = jax.device_get(y).astype("float32")
        attention.set_default_backend("auto")
    import numpy as np

    d = float(np.max(np.abs(outs["xla"] - outs["flash"])))
    ref = float(np.max(np.abs(outs["xla"])))
    results["max_abs_delta"] = d
    results["max_abs_ref"] = ref
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
