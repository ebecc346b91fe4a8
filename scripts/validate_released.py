"""One-command released-weight validation harness (VERDICT r2 item 3).

Given the released Wan2.1 / PAVRM artifacts, this converts, loads, and
exercises each through the framework:

  (a) DiT + VAE (+T5): a t2v sample to mp4 via scripts/inference.py
  (b) PAVRM heads:     reward metrics at per-timestep buckets over a
                       temp_data-style val list via scripts/inference_pavrm
  (c) every converter: torch -> flax -> torch roundtrip max-abs-diff

Every stage prints a clear SKIP line when its weights are absent, so the
harness can run the day weights appear with:

    python scripts/validate_released.py \
        --dit_dir weights/Wan2.1-T2V-14B \
        --vae_pth weights/Wan2.1_VAE.pth \
        --t5_pth  weights/models_t5_umt5-xxl-enc-bf16.pth \
        --clip_pth weights/models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth \
        --mlp_ckpt weights/mlp_step_2000.ckpt \
        --qattn_ckpt weights/query_attention_step_2000.ckpt \
        --val_meta temp_data/temp_data_480.list

`--selftest` fabricates reference-format random checkpoints at tiny sizes
(via the inverse converters) and runs ALL stages end-to-end — proving the
harness itself works without any released weights (exercised by
tests/test_cli_smoke.py).

Reference anchors: WanModel.from_pretrained load path (wan/modules/
model.py:413-440), head checkpoints (train_pavrm.py:993-998), encoder
checkpoints (wan/modules/{t5,clip,vae}.py state dicts).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _diff(a: dict, b: dict) -> float:
    keys = set(a) | set(b)
    missing = [k for k in keys if k not in a or k not in b]
    assert not missing, f"roundtrip key mismatch: {missing[:5]}"
    return max(float(np.abs(np.asarray(a[k], np.float64)
                            - np.asarray(b[k], np.float64)).max())
               for k in keys)


def _load_torch_state(path):
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def stage_convert(args, out_dir, report):
    """(c) convert + roundtrip byte-diffs for every provided artifact."""
    import jax

    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from hyvideo_prfl_tpu.utils import convert_encoders as ce

    converted = {}

    def do(kind, src, fwd, inv, cfgs, lenient=False):
        if not src or not os.path.exists(src):
            print(f"SKIP convert[{kind}]: no weights at {src!r}")
            report[f"convert_{kind}"] = "skipped"
            return
        state = (ck.load_safetensors_dir(src) if os.path.isdir(src)
                 else _load_torch_state(src))
        params = fwd(state, *cfgs)
        rt = inv(jax.device_get(params), *cfgs)
        if lenient:
            # released combined checkpoints may carry buffers outside the
            # converted surface (position_ids and the like); tolerate ONLY
            # non-weight-looking keys — a missed .weight/.bias/embedding
            # is a converter gap and must fail loudly
            extra = sorted(set(state) - set(rt))
            weightlike = [k for k in extra
                          if k.endswith((".weight", ".bias"))
                          or "embedding" in k]
            assert not weightlike, (
                f"converter missed weight keys: {weightlike[:5]}")
            if extra:
                print(f"convert[{kind}]: ignoring {len(extra)} unconverted "
                      f"non-weight buffers (e.g. {extra[:3]})")
                report[f"convert_{kind}_unconverted"] = extra[:20]
                state = {k: v for k, v in state.items() if k in rt}
        d = _diff(state, rt)
        out = os.path.join(out_dir, kind)
        ck.save_orbax(out, jax.device_get(params))
        converted[kind] = out
        report[f"convert_{kind}"] = {"roundtrip_max_abs_diff": d,
                                     "n_keys": len(state), "orbax": out}
        print(f"convert[{kind}]: {len(state)} keys, "
              f"roundtrip max|diff|={d:.3g} -> {out}")
        assert d < 1e-5, f"{kind} roundtrip diverged: {d}"
        return params

    dit_cfg = args._dit_cfg
    dit_params = do("dit", args.dit_dir, ck.torch_state_to_flax,
                    ck.flax_to_torch_state, (dit_cfg,))
    if dit_params is not None:
        # fixed-max flash forward contract (ops/flash_attention.py
        # FLASH_BOUNDED): report the checkpoint's qk-norm logit figures.
        # `typical` (per-head energy spread) must sit far below the
        # fp32-safe ~70; `worst` (all energy in one aligned head) exceeds
        # it at 14B dims, so the guarantee is empirical — overflow is a
        # loud NaN, and HYV_FLASH_BOUNDED=0 forces the shifted softmax.
        from hyvideo_prfl_tpu.ops.flash_attention import attn_logit_bound

        typical, worst = attn_logit_bound(dit_params, dit_cfg.head_dim)
        report["attn_logit_bound_typical"] = round(typical, 2)
        report["attn_logit_bound_worst"] = round(worst, 2)
        print(f"attn logit bounds (fixed-max flash contract): "
              f"typical {typical:.1f} (want << 70), worst-case {worst:.1f}")
        # 0.0 means the walk found NO norm gains — unknown, not safe
        assert typical > 0.0, (
            "attn_logit_bound found no norm_q/norm_k gains in the "
            "converted DiT tree — cannot certify the fixed-max flash "
            "forward; set HYV_FLASH_BOUNDED=0 or fix the tree walk")
        assert typical < 70.0, (
            f"qk-norm gains give typical logit bound {typical:.1f} >= 70; "
            "set HYV_FLASH_BOUNDED=0 for this checkpoint")
        del dit_params
    do("vae", args.vae_pth, ce.vae_torch_to_flax, ce.vae_flax_to_torch,
       (args._vae_cfg,))
    do("t5", args.t5_pth, ce.t5_torch_to_flax, ce.t5_flax_to_torch,
       (args._t5_cfg,))
    # the released clip pth is the COMBINED open-clip checkpoint: vision
    # tower + XLM-R text tower + head + log_scale (clip.py:329-405)
    do("clip", args.clip_pth, ce.clip_full_torch_to_flax,
       ce.clip_full_flax_to_torch, (args._clip_cfg, args._txt_cfg),
       lenient=True)
    do("mlp", args.mlp_ckpt,
       lambda s: ce.reward_mlp_torch_to_flax(s),
       lambda p: ce.reward_mlp_flax_to_torch(p), ())
    do("qattn", args.qattn_ckpt,
       lambda s: ce.query_attention_torch_to_flax(s),
       lambda p: ce.query_attention_flax_to_torch(p), ())
    return converted


def stage_sample(args, converted, out_dir, report):
    """(a) t2v sample -> mp4 through the real inference CLI."""
    if not (args.dit_dir and os.path.isdir(args.dit_dir)):
        print("SKIP sample: no --dit_dir")
        report["sample"] = "skipped"
        return
    from scripts.inference import main as inf_main

    save = os.path.join(out_dir, "validate_sample.mp4")
    argv = ["--task", args.task, "--size", args.size,
            "--ckpt_dir", args.dit_dir,
            "--frame_num", str(args.frame_num),
            "--sample_steps", str(args.sample_steps),
            "--save_file", save]
    if "vae" in converted:
        argv += ["--vae_params", converted["vae"]]
    if args.selftest:
        argv += ["--smoke_tiny", "--prompt", "validation sample"]
    elif "t5" in converted:
        argv += ["--t5_params", converted["t5"],
                 "--prompt", args.prompt]
    rc = inf_main(argv)
    ok = rc == 0 and (os.path.exists(save)
                      or os.path.exists(save.replace(".mp4", "_frames.npy"))
                      or os.path.exists(save.replace(".mp4", "_latents.npy")))
    report["sample"] = {"rc": rc, "file": save, "ok": bool(ok)}
    print(f"sample: rc={rc} -> {save} ok={ok}")
    assert ok, "sample stage failed"


def stage_quant(args, converted, out_dir, report):
    """(a2) the same t2v sample under --quant int8, PSNR'd against the
    bf16 one — the per-checkpoint quality gate the int8 serving path
    requires before production (ops/quant.py docstring)."""
    bf16 = report.get("sample")
    if not isinstance(bf16, dict) or not bf16.get("ok"):
        print("SKIP quant: no bf16 sample to compare against")
        report["quant_int8"] = "skipped"
        return
    from scripts.inference import main as inf_main

    save = os.path.join(out_dir, "validate_sample_int8.mp4")
    argv = ["--task", args.task, "--size", args.size,
            "--ckpt_dir", args.dit_dir,
            "--frame_num", str(args.frame_num),
            "--sample_steps", str(args.sample_steps),
            "--quant", "int8", "--save_file", save]
    if "vae" in converted:
        argv += ["--vae_params", converted["vae"]]
    if args.selftest:
        argv += ["--smoke_tiny", "--prompt", "validation sample"]
    elif "t5" in converted:
        argv += ["--t5_params", converted["t5"], "--prompt", args.prompt]
    rc = inf_main(argv)
    psnr = None
    try:
        import cv2
        import numpy as np

        def frames(p):
            cap = cv2.VideoCapture(p)
            out = []
            while True:
                ok, f = cap.read()
                if not ok:
                    break
                out.append(f)
            return np.stack(out).astype(np.float32)

        a, b = frames(bf16["file"]), frames(save)
        mse = float(np.mean((a - b) ** 2))
        psnr = 99.0 if mse == 0 else float(
            10.0 * np.log10(255.0 ** 2 / mse))
    except Exception as e:  # noqa: BLE001 — report, don't crash the gate
        print(f"quant: PSNR computation failed: {e}")
    ok = rc == 0 and psnr is not None
    report["quant_int8"] = {"rc": rc, "file": save,
                            "psnr_vs_bf16_db": psnr, "ok": bool(ok)}
    print(f"quant_int8: rc={rc} PSNR vs bf16 = {psnr} dB ok={ok}")
    assert ok, "quant stage failed"


def stage_reward(args, out_dir, report):
    """(b) PAVRM reward at timestep buckets over the val meta list."""
    if not (args.dit_dir and args.mlp_ckpt and args.qattn_ckpt
            and args.val_meta and os.path.exists(args.mlp_ckpt)):
        print("SKIP reward: needs --dit_dir, --mlp_ckpt, --qattn_ckpt, "
              "--val_meta")
        report["reward"] = "skipped"
        return
    from scripts.inference_pavrm import main as pavrm_main
    from hyvideo_prfl_tpu.configs import load_config

    config = load_config(args.pavrm_config)
    config["model"]["base_path"] = args.dit_dir
    config["model"]["lrm_transformer_path"] = args.dit_dir
    config["model"]["lrm_mlp_path"] = args.mlp_ckpt
    config["model"]["lrm_query_attention_path"] = args.qattn_ckpt
    config["dataset"]["val_meta_file_list"] = [args.val_meta]
    results = pavrm_main(config, max_samples=args.max_reward_samples)
    report["reward"] = results
    print(f"reward: {len(results)} timestep buckets evaluated")


def fabricate_selftest_weights(args, root):
    """Random reference-format checkpoints at tiny sizes, written through
    the INVERSE converters (so the fabricated files have exactly the
    released key/layout surface)."""
    import jax
    import jax.numpy as jnp
    import torch

    from hyvideo_prfl_tpu.models import clip as clip_mod
    from hyvideo_prfl_tpu.models import reward as rw
    from hyvideo_prfl_tpu.models import t5 as t5_mod
    from hyvideo_prfl_tpu.models import vae as vae_mod
    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from hyvideo_prfl_tpu.utils import convert_encoders as ce

    cfg = args._dit_cfg
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    args.dit_dir = ck.save_wan_checkpoint(params, cfg,
                                          os.path.join(root, "dit"))

    vp = vae_mod.init_vae_params(args._vae_cfg, jax.random.PRNGKey(1))
    args.vae_pth = os.path.join(root, "vae.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                ce.vae_flax_to_torch(jax.device_get(vp),
                                     args._vae_cfg).items()},
               args.vae_pth)

    t5p = t5_mod.T5Encoder(args._t5_cfg).init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32))
    args.t5_pth = os.path.join(root, "t5.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                ce.t5_flax_to_torch(jax.device_get(t5p),
                                    args._t5_cfg).items()},
               args.t5_pth)

    from hyvideo_prfl_tpu.models import xlm_roberta as xlm_mod

    cp = clip_mod.init_clip_params(args._clip_cfg, jax.random.PRNGKey(3))
    tc = args._txt_cfg
    txt = xlm_mod.XLMRoberta(tc).init(jax.random.PRNGKey(6),
                                      jnp.ones((1, 8), jnp.int32))
    mid = (tc.dim + 16) // 2
    rng = np.random.RandomState(7)
    vd = args._clip_cfg.dim
    full = {
        "visual": jax.device_get(cp),
        "textual": {"params": jax.device_get(txt)["params"],
                    "head": {"h0": rng.randn(tc.dim, mid).astype(np.float32),
                             "h2": rng.randn(mid, 16).astype(np.float32)}},
        "log_scale": np.float32(2.6593),
        # dead-but-present released-tower weights (post_norm + pool head)
        # so the selftest exercises the full real key surface
        "visual_extras": {
            "post_norm_scale": np.ones((vd,), np.float32),
            "post_norm_bias": np.zeros((vd,), np.float32),
            "head": rng.randn(vd, 16).astype(np.float32),
        },
    }
    args.clip_pth = os.path.join(root, "clip.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                ce.clip_full_flax_to_torch(full, args._clip_cfg,
                                           tc).items()},
               args.clip_pth)

    d = cfg.dim
    mlp = rw.RewardMLP().init(jax.random.PRNGKey(4), jnp.zeros((1, d)))
    args.mlp_ckpt = os.path.join(root, "mlp_step_0.ckpt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                ce.reward_mlp_flax_to_torch(jax.device_get(mlp)).items()},
               args.mlp_ckpt)
    qa = rw.QueryAttention(feature_dim=d, num_heads=8, return_type="query"
                           ).init(jax.random.PRNGKey(5), jnp.zeros((1, 8, d)))
    args.qattn_ckpt = os.path.join(root, "query_attention_step_0.ckpt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                ce.query_attention_flax_to_torch(
                    jax.device_get(qa)).items()},
               args.qattn_ckpt)
    args.val_meta = "temp_data_smoke/smoke.list"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dit_dir", default=None)
    p.add_argument("--vae_pth", default=None)
    p.add_argument("--t5_pth", default=None)
    p.add_argument("--clip_pth", default=None)
    p.add_argument("--mlp_ckpt", default=None)
    p.add_argument("--qattn_ckpt", default=None)
    p.add_argument("--val_meta", default=None)
    p.add_argument("--task", default="t2v-14B")
    p.add_argument("--size", default="480*832")
    p.add_argument("--frame_num", type=int, default=33)
    p.add_argument("--sample_steps", type=int, default=20)
    p.add_argument("--prompt", default="a corgi running on a beach at "
                                       "sunset, cinematic")
    p.add_argument("--pavrm_config", default="configs/smoke_pavrm.yaml")
    p.add_argument("--max_reward_samples", type=int, default=None)
    p.add_argument("--out_dir", default="validation_out")
    p.add_argument("--selftest", action="store_true",
                   help="fabricate tiny reference-format weights and run "
                        "all stages end-to-end (no released weights needed)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from hyvideo_prfl_tpu.configs import dit_config_for_task
    from hyvideo_prfl_tpu.models import clip as clip_mod
    from hyvideo_prfl_tpu.models import t5 as t5_mod
    from hyvideo_prfl_tpu.models import vae as vae_mod
    from hyvideo_prfl_tpu.models import wan_dit

    from hyvideo_prfl_tpu.models import xlm_roberta as xlm_mod

    if args.selftest:
        args._dit_cfg = wan_dit.tiny_test()
        args._vae_cfg = vae_mod.tiny_vae(z_dim=16)
        args._t5_cfg = t5_mod.tiny_t5()
        args._clip_cfg = clip_mod.tiny_clip()
        args._txt_cfg = xlm_mod.tiny_xlmr()
    else:
        args._dit_cfg = dit_config_for_task(args.task)
        args._vae_cfg = vae_mod.VAEConfig()
        args._t5_cfg = t5_mod.umt5_xxl()
        args._clip_cfg = clip_mod.vit_h_14()
        args._txt_cfg = xlm_mod.xlm_roberta_large()

    os.makedirs(args.out_dir, exist_ok=True)
    report = {}
    tmp = None
    if args.selftest:
        tmp = tempfile.mkdtemp(prefix="validate_selftest_")
        fabricate_selftest_weights(args, tmp)
        # tiny DiT uses the smoke pavrm config's feature_layer=[2] with 2
        # layers, trainable [0, 1] — consistent by construction
        from hyvideo_prfl_tpu.configs import load_config  # noqa: F401

    converted = stage_convert(args, args.out_dir, report) or {}
    stage_sample(args, converted, args.out_dir, report)
    stage_quant(args, converted, args.out_dir, report)
    if args.selftest:
        # the smoke pavrm config's override must match the fabricated DiT
        import yaml

        cfg_path = os.path.join(args.out_dir, "selftest_pavrm.yaml")
        with open(args.pavrm_config) as f:
            c = yaml.safe_load(f)
        c["model"]["override"] = {
            "dim": args._dit_cfg.dim, "ffn_dim": args._dit_cfg.ffn_dim,
            "num_heads": args._dit_cfg.num_heads,
            "num_layers": args._dit_cfg.num_layers,
            "freq_dim": args._dit_cfg.freq_dim,
            "text_dim": args._dit_cfg.text_dim, "remat": False,
        }
        c["lrm"]["feature_layer"] = [2]
        c["lrm"]["trainable_blocks"] = [0, 1]
        with open(cfg_path, "w") as f:
            yaml.safe_dump(c, f)
        args.pavrm_config = cfg_path
        args.max_reward_samples = args.max_reward_samples or 4
    stage_reward(args, args.out_dir, report)

    out = os.path.join(args.out_dir, "validation_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"report -> {out}")
    skipped = [k for k, v in report.items() if v == "skipped"]
    print(f"stages: {len(report) - len(skipped)} ran, "
          f"{len(skipped)} skipped {skipped}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
