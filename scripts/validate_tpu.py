"""On-hardware kernel validation: run the Pallas/Mosaic kernels on the real
TPU chip and compare against plain-XLA formulas.

CPU tests (tests/, interpret-mode pallas) prove the math; this script
proves the MOSAIC LOWERINGS — run it after touching any kernel or after a
toolchain bump. Exits non-zero on any tolerance failure.

Checks:
  1. flash attention fwd vs XLA attention (bf16 kernel tolerance)
  2. flash attention bwd (dq/dk/dv) vs XLA autodiff
  3. fused qk-RMSNorm+RoPE vs the unfused XLA chain
  4. ring _block_bwd (flash-bwd against a global lse) vs the einsum formula
  5. DPM++ rollout jit == eager per-step (the axon while-loop miscompile
     class — see CLAUDE.md)
  6. bounded (fixed-max) flash forward vs the shifted-softmax forward at
     qk-norm-scale logits (round-3e kernel)
  7. single-pass merged flash backward vs the split dq/dkv kernels at a
     length where the merged path engages (round-3d kernel)
  8. fused LN+modulate stream kernel (ops/stream.py) fwd+bwd vs the XLA
     chain at a RAGGED length (non-multiple-of-8 grid, round-3f)
  9. ragged-grid qknorm_rope (non-multiple-of-8 token count)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name, got, want, atol, rtol=None):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    m = float(np.max(np.abs(got - want)))
    rel = m / (float(np.max(np.abs(want))) + 1e-9)
    ok = m <= atol or (rtol is not None and rel <= rtol)
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|diff|={m:.3e} rel={rel:.3e}")
    if not ok:
        FAILED.append(name)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])

    # ---- 1+2: flash attention fwd + bwd -----------------------------------
    from hyvideo_prfl_tpu.ops.attention import _xla_attention
    from hyvideo_prfl_tpu.ops.flash_attention import flash_attention

    b, l, n, d = 1, 640, 4, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, w = (jax.random.normal(kk, (b, l, n, d), jnp.bfloat16)
                  for kk in ks)
    ref = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), None)
    out = jax.jit(flash_attention)(q, k, v)
    check("flash_fwd", out, ref, atol=2e-2, rtol=2e-2)

    loss_flash = lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, bounded_logits=True
                        ).astype(jnp.float32) * w.astype(jnp.float32))
    loss_xla = lambda q, k, v: jnp.sum(
        _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                       v.astype(jnp.float32), None)
        * w.astype(jnp.float32))
    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for name, a, r in zip(("dq", "dk", "dv"), g_flash, g_xla):
        check(f"flash_bwd_{name}", a, r, atol=5e-2, rtol=2e-2)

    # ---- 3: fused qk-RMSNorm+RoPE -----------------------------------------
    from hyvideo_prfl_tpu.ops import qknorm_rope as qr
    from hyvideo_prfl_tpu.models.rope import rope_tables_rolled

    dim = n * d
    x = jax.random.normal(jax.random.PRNGKey(5), (1, l, dim), jnp.bfloat16)
    wq = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(6), (dim,))
    cos, sin = rope_tables_rolled((4, 8, 20), d)
    fused = jax.jit(lambda x, w: qr.rmsnorm_rope(x, w, cos, sin, n, 1e-6)
                    )(x, wq)
    ref_q = qr._xla_ref(x, wq.reshape(n, d), cos.astype(jnp.float32),
                        sin.astype(jnp.float32), 1e-6, True)
    check("qknorm_rope", fused, ref_q, atol=2e-2, rtol=2e-2)

    # ---- 4: ring per-block backward ---------------------------------------
    from hyvideo_prfl_tpu.ops import ring_attention as ra

    o32, lse = ra._block_attention_with_lse(q.astype(jnp.float32),
                                            k.astype(jnp.float32),
                                            v.astype(jnp.float32))
    o = o32
    do = w.astype(jnp.float32)
    tpu = jax.jit(ra._block_bwd)(q.astype(jnp.float32),
                                 k.astype(jnp.float32),
                                 v.astype(jnp.float32), o, lse, do)

    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    s = jnp.einsum("bqnd,bknd->bnqk", qf, kf,
                   preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse.transpose(0, 2, 1)[..., None])
    delta = jnp.sum(do * o, axis=-1)
    dv_ref = jnp.einsum("bnqk,bqnd->bknd", p, do)
    dp = jnp.einsum("bqnd,bknd->bnqk", do, vf)
    ds = p * (dp - delta.transpose(0, 2, 1)[..., None]) * scale
    dq_ref = jnp.einsum("bnqk,bknd->bqnd", ds, kf)
    dk_ref = jnp.einsum("bnqk,bqnd->bknd", ds, qf)
    for name, a, r in zip(("dq", "dk", "dv"), tpu,
                          (dq_ref, dk_ref, dv_ref)):
        check(f"ring_block_bwd_{name}", a, r, atol=5e-2, rtol=1e-2)

    # ---- 6: bounded flash forward vs shifted ------------------------------
    # qk-norm-scale inputs (the regime the bounded kernel is wired for)
    qs, ks_, vs = (0.3 * t for t in (q, k, v))
    out_b = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, bounded_logits=True))(qs, ks_, vs)
    out_s = jax.jit(lambda q, k, v: flash_attention(q, k, v))(qs, ks_, vs)
    check("flash_bounded_vs_shifted", out_b, out_s, atol=1e-3, rtol=1e-3)

    # ---- 7: merged backward vs split kernels ------------------------------
    import hyvideo_prfl_tpu.ops.flash_attention as fa_mod

    lm = 2560  # long enough that the merged single-pass path engages
    km = jax.random.split(jax.random.PRNGKey(11), 4)
    qm, kmt, vm, wm = (0.3 * jax.random.normal(kk, (1, lm, 4, d), jnp.bfloat16)
                       for kk in km)
    lossm = lambda q, k, v: jnp.sum(
        flash_attention(q, k, v).astype(jnp.float32)
        * wm.astype(jnp.float32))
    saved = fa_mod.FLASH_MERGED_BWD
    try:
        fa_mod.FLASH_MERGED_BWD = True
        g_merged = jax.jit(jax.grad(lambda q, k, v: lossm(q, k, v),
                                    argnums=(0, 1, 2)))(qm, kmt, vm)
        fa_mod.FLASH_MERGED_BWD = False
        g_split = jax.jit(jax.grad(lambda a, bb, c: lossm(a, bb, c),
                                   argnums=(0, 1, 2)))(qm, kmt, vm)
    finally:
        fa_mod.FLASH_MERGED_BWD = saved
    for name, a, r in zip(("dq", "dk", "dv"), g_merged, g_split):
        check(f"flash_merged_vs_split_{name}", a, r, atol=1e-3, rtol=1e-3)

    # ---- 8: fused LN+modulate stream kernel at a ragged length ------------
    from hyvideo_prfl_tpu.ops import stream

    lr = 660  # 660 = 4*165: no multiple-of-8 divisor => ragged grid
    xs = jax.random.normal(jax.random.PRNGKey(12), (1, lr, dim), jnp.float32)
    ss = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(13), (1, dim))
    ts = 0.1 * jax.random.normal(jax.random.PRNGKey(14), (1, dim))
    fused_ln = jax.jit(lambda x, s, t: stream.ln_scale_shift(x, s, t))(
        xs, ss, ts)
    ref_ln = stream._xla_ref(xs, ss, ts, 1e-6, jnp.bfloat16)
    check("stream_ln_ragged_fwd", fused_ln, ref_ln, atol=2e-2, rtol=2e-2)

    gw = jax.random.normal(jax.random.PRNGKey(15), (1, lr, dim), jnp.float32)
    loss_f = lambda x, s, t: jnp.sum(
        stream.ln_scale_shift(x, s, t).astype(jnp.float32) * gw)
    loss_r = lambda x, s, t: jnp.sum(
        stream._xla_ref(x, s, t, 1e-6, jnp.bfloat16).astype(jnp.float32) * gw)
    gs_f = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(xs, ss, ts)
    gs_r = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(xs, ss, ts)
    for name, a, r in zip(("dx", "ds", "dt"), gs_f, gs_r):
        check(f"stream_ln_ragged_bwd_{name}", a, r, atol=5e-2, rtol=2e-2)

    # batch > 1 (the batched-CFG serving path): a (1, d) s/t block of a
    # (b, d) array is rejected by Mosaic when b > 1 — caught on hardware
    # at b=2; the kernel now feeds s/t as (b, 1, d)
    xb = jax.random.normal(jax.random.PRNGKey(17), (2, lr, dim), jnp.float32)
    sb = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(18), (2, dim))
    tb = 0.1 * jax.random.normal(jax.random.PRNGKey(19), (2, dim))
    fused_b2 = jax.jit(lambda x, s, t: stream.ln_scale_shift(x, s, t))(
        xb, sb, tb)
    check("stream_ln_batch2_fwd", fused_b2,
          stream._xla_ref(xb, sb, tb, 1e-6, jnp.bfloat16), atol=2e-2,
          rtol=2e-2)
    gb = jax.random.normal(jax.random.PRNGKey(20), (2, lr, dim), jnp.float32)
    loss_b = lambda x, s, t: jnp.sum(
        stream.ln_scale_shift(x, s, t).astype(jnp.float32) * gb)
    loss_rb = lambda x, s, t: jnp.sum(
        stream._xla_ref(x, s, t, 1e-6, jnp.bfloat16).astype(jnp.float32) * gb)
    gsb = jax.jit(jax.grad(loss_b, argnums=(0, 1, 2)))(xb, sb, tb)
    gsrb = jax.jit(jax.grad(loss_rb, argnums=(0, 1, 2)))(xb, sb, tb)
    for name, a, r in zip(("dx", "ds", "dt"), gsb, gsrb):
        check(f"stream_ln_batch2_bwd_{name}", a, r, atol=5e-2, rtol=2e-2)

    # ---- 9: ragged-grid qknorm_rope ----------------------------------------
    cos_r, sin_r = rope_tables_rolled((4, 11, 15), d)  # 660 tokens
    xr = jax.random.normal(jax.random.PRNGKey(16), (1, lr, dim), jnp.bfloat16)
    fused_r = jax.jit(lambda x, w: qr.rmsnorm_rope(x, w, cos_r, sin_r, n,
                                                   1e-6))(xr, wq)
    ref_r = qr._xla_ref(xr, wq.reshape(n, d), cos_r.astype(jnp.float32),
                        sin_r.astype(jnp.float32), 1e-6, True)
    check("qknorm_rope_ragged", fused_r, ref_r, atol=2e-2, rtol=2e-2)

    # ---- 5: DPM++ rollout jit == eager ------------------------------------
    from hyvideo_prfl_tpu.schedulers import dpm as dpm_mod

    vel = lambda x, t: jnp.tanh(x * 0.1) * (1.0 + 0.001 * t)
    noise = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 8, 8, 16))
    sched = dpm_mod.dpm_schedule(10, shift=5.0)
    x_jit, _ = jax.jit(lambda z: dpm_mod.rollout(sched, vel, z))(noise)
    x_eager, _ = dpm_mod.rollout(sched, vel, noise)
    check("dpm_jit_vs_eager", x_jit, x_eager, atol=0.0, rtol=1e-7)

    if FAILED:
        print("FAILED:", FAILED)
        return 1
    print("all TPU kernel validations passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
