"""Real-chip measurement of the int8 NO-GRAD rollout option
(PrflConfig.rollout_quant="int8") at the 14B sp=4 training shapes, and the
composed refl-step estimate with it on.

The refl step is 19 rollout forwards (stop_gradient) + 1 gradient forward
+ the 8-block LRM forward + 2 optimizer steps (BENCH_COMPOSED.json
composition). rollout_quant runs ONLY the 19 no-grad forwards through the
W8A8+qk8 serving graph on live per-step-quantized weights:

    new_step = step_bf16 - 19 * (fwd_bf16 - fwd_int8qk8) + T_quantize

Components measured here (per-device batch 1, the data=2 x sp=4 mesh):
  * 14B-dim WanBlock fwd at the 18,900-token local shard, bf16 vs
    quant_dense+quant_attn int8
  * flash fwd 40h @ 18.9k local, bf16 vs qk8 (subtraction term)
  * flash fwd 10h @ 75.6k (true Ulysses shape), bf16 vs qk8
  * quantize_params on a per-device-sized param slice (~1.75B params =
    14B / 8-way FSDP): the once-per-step quantization cost

Writes the composed row into BENCH_COMPOSED.json
(composed_step_rollout_int8_s) for bench.py.
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
from hyvideo_prfl_tpu.models.rope import rope_tables_rolled
from hyvideo_prfl_tpu.ops import flash_attention as fa
from hyvideo_prfl_tpu.ops import quant

DIM, HEADS, FFN = 5120, 40, 13824
L_LOC = 18900                 # 75,600 / sp4
L_FULL = 75600
H_DEV = HEADS // 4            # 10 heads during Ulysses attention
B = 1                         # per-device batch (global 2 over data=2)
GRID = (21, 45, 20)           # 18,900 local tokens
K = 2


def timeit(tag, fn, *args, rt=0.0, n=3):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = (min(ts) - rt) / K
    print(json.dumps({"tag": tag, "ms": round(best * 1e3, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return best


def flash_time(heads, length, rt, tag, qk_int8):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, length, heads, 128),
                          jnp.bfloat16) * 0.1

    @jax.jit
    def fwdK(q):
        def body(q, _):
            return fa.flash_attention(
                q, q, q, bounded_logits=True,
                qk_int8=qk_int8).astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(q.astype(jnp.float32))

    return timeit(f"flash_{tag}", fwdK, q, rt=rt)


def main():
    trivial = jax.jit(lambda a: jnp.sum(a) + 1.0)
    t0 = time.perf_counter()
    float(trivial(jnp.zeros((8, 128))))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(jnp.zeros((8, 128))))
        ts.append(time.perf_counter() - t0)
    rt = min(ts)
    print(json.dumps({"roundtrip_s": round(rt, 4)}), flush=True)

    cos, sin = rope_tables_rolled(GRID, DIM // HEADS)
    x = jnp.ones((B, L_LOC, DIM), jnp.float32) * 0.1
    ctx = jnp.ones((B, 769, DIM), jnp.bfloat16) * 0.1
    e6 = jnp.ones((B, 6, DIM), jnp.float32) * 0.1

    blk_t = {}
    p_bf16 = None
    for tag, qd, qa in (("bf16", None, None), ("int8qk8", "int8", "int8")):
        cfg = wan_dit.WanConfig(model_type="i2v", in_dim=36, dim=DIM,
                                ffn_dim=FFN, num_heads=HEADS, num_layers=1,
                                remat=False, quant_dense=qd, quant_attn=qa)
        blk = wan_dit.WanBlock(cfg)
        if qd is None:
            p = blk.init(jax.random.PRNGKey(0), x, e6, ctx, cos, sin)
            p_bf16 = p
        else:
            qshapes = jax.eval_shape(
                lambda blk=blk: blk.init(jax.random.PRNGKey(0), x, e6, ctx,
                                         cos, sin))
            p = quant.quantize_params(p_bf16, qshapes)

        @jax.jit
        def fwdK(p, x, blk=blk):
            def body(x, _):
                return blk.apply(p, x, e6, ctx, cos, sin).astype(x.dtype), None
            x, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(x)

        blk_t[tag] = timeit(f"block_fwd_{tag}", fwdK, p, x, rt=rt)
        del p

    fl_loc = {t: flash_time(HEADS, L_LOC, rt, f"40h_18k9_{t}", t != "bf16")
              for t in ("bf16", "qk8")}
    fl_dev = {t: flash_time(H_DEV, L_FULL, rt, f"10h_75k6_{t}", t != "bf16")
              for t in ("bf16", "qk8")}

    # once-per-step quantization of the per-device param shard: 5 stacked
    # 14B-dim blocks = the full quantized kernel surface per block
    # (self qkv+o = 4 D^2, cross q/o + k_img/v_img = 4 D^2, ffn in+out
    # = 2 D FFN) ~= 1.73B params ~= 14B / 8-way FSDP
    wq_src = {
        "self_qkvo": jnp.ones((5, DIM, 4 * DIM), jnp.float32) * 0.01,
        "cross_qo_kimg_vimg": jnp.ones((5, DIM, 4 * DIM), jnp.float32) * 0.01,
        "ffn_in": jnp.ones((5, DIM, FFN), jnp.float32) * 0.01,
        "ffn_out": jnp.ones((5, FFN, DIM), jnp.float32) * 0.01,
    }
    n_q = sum(int(w.size) for w in wq_src.values())
    print(json.dumps({"tag": "quantize_tree_params_b",
                      "v": n_q}), flush=True)

    @jax.jit
    def quantK(tree):
        # perturb the tree by the carry so the quantize body depends on the
        # loop state — otherwise it is loop-invariant and XLA's LICM hoists
        # it out of the scan, under-reporting the per-iteration time
        def body(acc, _):
            t2 = jax.tree.map(lambda w: w + acc, tree)
            qs = jax.tree.map(lambda w: quant.quantize_weight(w)[0], t2)
            s = sum(jnp.sum(q.astype(jnp.float32))
                    for q in jax.tree.leaves(qs))
            return acc + s * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=K)
        return acc

    t_quant = timeit("quantize_1.73B_params", quantK, wq_src, rt=rt)

    # --- composition against BENCH_COMPOSED.json ---
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bc_path = os.path.join(repo, "BENCH_COMPOSED.json")
    with open(bc_path) as f:
        bc = json.load(f)
    a2a = bc.get("a2a_fwd_ms_est", 7.5) / 1e3
    emb = bc["embeds_head_fwd_ms"] / 1e3
    layers = 40

    def fwd_of(blk, loc, dev):
        return layers * (blk - loc + dev + a2a) + emb

    fwd_bf16 = fwd_of(blk_t["bf16"], fl_loc["bf16"], fl_dev["bf16"])
    fwd_i8 = fwd_of(blk_t["int8qk8"], fl_loc["qk8"], fl_dev["qk8"])
    step_bf16 = bc["composed_step_s"]
    delta = 19.0 * (fwd_bf16 - fwd_i8) - t_quant
    step_i8 = step_bf16 - delta
    out = {
        "fwd_dev_bf16_s": round(fwd_bf16, 3),
        "fwd_dev_int8qk8_s": round(fwd_i8, 3),
        "quantize_per_step_s": round(t_quant, 3),
        "rollout_int8_step_delta_s": round(delta, 2),
        "composed_step_rollout_int8_s": round(step_i8, 2),
        "rollout_int8_speedup": round(step_bf16 / step_i8, 3),
    }
    print(json.dumps(out), flush=True)
    bc.update(out)
    with open(bc_path, "w") as f:
        json.dump(bc, f, indent=2)
    print("updated BENCH_COMPOSED.json", flush=True)


if __name__ == "__main__":
    main()
