"""End-to-end CLI smoke runs on the committed fixture cache.

The JAX analog of the reference's torchrun smoke runs on temp_data/
(SURVEY.md section 4 fixtures row). The i2v configs exercise the full
conditioning path: 16-channel f1_black latents -> mask concat -> in_dim-36
DiT + CLIP image context.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyvideo_prfl_tpu.configs import load_config


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path / "outputs")


def _finite_log_losses(state):
    assert int(state.step) > 0


def test_train_prfl_i2v_cli(outdir):
    from scripts.train_prfl import main as prfl_main

    cfg = load_config("configs/smoke_prfl_i2v.yaml")
    cfg["save"]["output_dir"] = outdir
    state = prfl_main(cfg, max_steps=2)
    _finite_log_losses(state)
    for leaf in __import__("jax").tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_pavrm_i2v_cli(outdir):
    from scripts.train_pavrm import main as pavrm_main

    cfg = load_config("configs/smoke_pavrm_i2v.yaml")
    cfg["save"]["output_dir"] = outdir
    state = pavrm_main(cfg, max_steps=2)
    _finite_log_losses(state)


def test_train_prfl_sanity_decode_subprocess(outdir, tmp_path, monkeypatch):
    """HYV_DECODE_SUBPROCESS=1 routes the trainer's sanity decode through a
    fresh scripts/decode_latents.py process (VERDICT r3 weak #6: in-process
    VAE decode poisons the training heap on backends that never release
    HBM), with the VAE config inferred from the checkpoint itself
    (models/vae.infer_config) and the VAE params never loaded in-process."""
    import jax

    from hyvideo_prfl_tpu.models import vae as vae_mod
    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from scripts.train_prfl import main as prfl_main

    vae_dir = str(tmp_path / "vae_params")
    ck.save_orbax(vae_dir, vae_mod.init_vae_params(
        vae_mod.tiny_vae(z_dim=16), jax.random.PRNGKey(0)))

    cfg = load_config("configs/smoke_prfl.yaml")
    cfg["save"]["output_dir"] = outdir
    cfg["extra_model"]["vae"] = {"params_path": vae_dir}
    cfg["train"]["sanity_check_interval"] = 1
    monkeypatch.setenv("HYV_DECODE_SUBPROCESS", "1")
    state = prfl_main(cfg, max_steps=1)
    _finite_log_losses(state)

    import glob

    sanity = os.path.join(outdir, "smoke_prfl", "sanity_check")
    if not os.path.isdir(sanity):
        sanity = os.path.join(outdir, "sanity_check")
    hits = (glob.glob(os.path.join(sanity, "step*_pred_x0.mp4"))
            + glob.glob(os.path.join(sanity, "step*_pred_x0_frames.npy")))
    assert hits, f"subprocess sanity decode produced nothing in {sanity}"


def test_train_prfl_t2v_cli(outdir):
    from scripts.train_prfl import main as prfl_main

    cfg = load_config("configs/smoke_prfl.yaml")
    cfg["save"]["output_dir"] = outdir
    state = prfl_main(cfg, max_steps=2)
    _finite_log_losses(state)


def test_inference_i2v_raw_image_cli(tmp_path):
    """jpg + prompt -> mp4 with NO precomputed npys (VERDICT r2 item 4):
    in-pipeline CLIP visual + streaming VAE encode of [img, zeros] + mask
    concat (image2video.py:262-301)."""
    from PIL import Image

    from scripts.inference import main as inf_main

    img = tmp_path / "first.jpg"
    Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype("uint8")
    ).save(img)
    out = tmp_path / "vid.mp4"
    rc = inf_main([
        "--task", "i2v-14B", "--smoke_tiny",
        "--image", str(img), "--prompt", "a cat jumps",
        "--sample_steps", "2", "--save_file", str(out),
    ])
    assert rc == 0
    assert out.exists() or (tmp_path / "vid_frames.npy").exists()


def test_inference_prompt_file_loop_cli(tmp_path):
    """--prompt_file loops EvalPromptDataset records, one output per record
    (inference_prfl.py:339-379)."""
    from scripts.inference import main as inf_main

    pf = tmp_path / "prompts.txt"
    pf.write_text("a dog runs\na bird flies\n")
    out = tmp_path / "vid.mp4"
    rc = inf_main([
        "--task", "t2v-1.3B", "--smoke_tiny",
        "--prompt_file", str(pf), "--sample_steps", "2",
        "--save_file", str(out),
    ])
    assert rc == 0
    for i in range(2):
        assert (tmp_path / f"vid_{i:03d}.mp4").exists() or \
            (tmp_path / f"vid_{i:03d}_frames.npy").exists()


def test_inference_transformer_path_cli(tmp_path):
    """--transformer_path loads a post-trained DiT dir (reference-format
    safetensors, as scripts/train_prfl.py exports) instead of --ckpt_dir
    (image2video.py:108-110); --save_folder places outputs
    (inference_prfl.py --save_folder); --lora_alpha is accepted as the
    reference's spelling of --lora_scale."""
    import jax

    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.utils import checkpoint as ck
    from scripts.inference import main as inf_main

    cfg = wan_dit.tiny_test(model_type="t2v", in_dim=16)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(7))
    tdir = tmp_path / "transformer"
    ck.save_wan_checkpoint(params, cfg, str(tdir))

    folder = tmp_path / "outs"
    rc = inf_main([
        "--task", "t2v-1.3B", "--smoke_tiny",
        "--transformer_path", str(tdir),
        "--prompt", "a boat drifts", "--sample_steps", "2",
        "--lora_alpha", "1.0",
        "--save_folder", str(folder), "--save_file", "vid.mp4",
    ])
    assert rc == 0
    assert (folder / "vid.mp4").exists() or \
        (folder / "vid_frames.npy").exists()


def test_inference_t2i_cli(tmp_path):
    """t2i-14B = the t2v model at frame_num 1 writing a png
    (configs/__init__.py:11-13,48; arguments.py:209-211)."""
    from scripts.inference import main as inf_main

    out = tmp_path / "img.mp4"
    rc = inf_main([
        "--task", "t2i-14B", "--smoke_tiny", "--size", "480*832",
        "--prompt", "a red square", "--sample_steps", "2",
        "--save_file", str(out),
    ])
    assert rc == 0
    assert (tmp_path / "img.png").exists() or \
        (tmp_path / "img_frames.npy").exists()


def test_inference_flf2v_raw_images_cli(tmp_path):
    """first+last jpg -> flf2v conditioning (514-token CLIP stack, mask on
    both ends; first_last_frame2video.py)."""
    from PIL import Image

    from scripts.inference import main as inf_main

    rs = np.random.RandomState(1)
    first = tmp_path / "first.jpg"
    last = tmp_path / "last.jpg"
    for f in (first, last):
        Image.fromarray((rs.rand(32, 32, 3) * 255).astype("uint8")).save(f)
    out = tmp_path / "vid.mp4"
    rc = inf_main([
        "--task", "flf2v-14B", "--smoke_tiny",
        "--image", str(first), "--last_image", str(last),
        "--prompt", "sunrise", "--sample_steps", "2",
        "--save_file", str(out),
    ])
    assert rc == 0
    assert out.exists() or (tmp_path / "vid_frames.npy").exists()


def test_train_pavrm_resume_with_optimizer_state(outdir):
    """PAVRM resume parity (reference train_pavrm.py:254-259: reload the
    trainable state from checkpoint-<n>, continue at the parsed step) plus
    exact AdamW-moment resume via train.save_optimizer_state (beyond the
    reference, which restarts the optimizer from zero)."""
    import jax
    from scripts.train_pavrm import main as pavrm_main

    cfg = load_config("configs/smoke_pavrm.yaml")
    cfg["save"]["output_dir"] = outdir
    cfg["train"]["save_interval"] = 2
    cfg["train"]["save_optimizer_state"] = True
    state = pavrm_main(cfg, max_steps=2)
    run_dir = os.path.join(outdir, cfg["train_id"])
    ckpt = os.path.join(run_dir, "checkpoint-2")
    assert os.path.isdir(ckpt) and os.path.isdir(ckpt + "-opt")

    cfg2 = load_config("configs/smoke_pavrm.yaml")
    cfg2["save"]["output_dir"] = outdir
    cfg2["train"]["save_interval"] = 2
    cfg2["train"]["save_optimizer_state"] = True
    cfg2["model"]["resume_transformer_path"] = ckpt
    state2 = pavrm_main(cfg2, max_steps=4)  # continues steps 2..3
    assert int(state2.step) == int(state.step) + 2
    # params continued from the checkpoint, then trained further
    l0 = jax.tree.leaves(state.params)[0]
    l2 = jax.tree.leaves(state2.params)[0]
    assert l0.shape == l2.shape

    def max_count(s):
        return max(int(x) for x in jax.tree.leaves(s.opt_state)
                   if hasattr(x, "ndim") and x.ndim == 0
                   and np.issubdtype(x.dtype, np.integer))

    # the restored AdamW state CONTINUES its update count (run 1's updates
    # carried over) — proves moments were loaded, not re-initialized
    assert max_count(state2) == 2 * max_count(state)


def test_train_prfl_resume_with_optimizer_state(outdir):
    """PRFL resume with exact AdamW-moment restore: checkpoint-<n> gets an
    opt_state/ orbax subdir (train.save_optimizer_state) that the resume
    path loads onto the live shardings."""
    from scripts.train_prfl import main as prfl_main

    cfg = load_config("configs/smoke_prfl.yaml")
    cfg["save"]["output_dir"] = outdir
    cfg["train"]["save_interval"] = 2
    cfg["train"]["save_optimizer_state"] = True
    state = prfl_main(cfg, max_steps=2)
    run_dir = os.path.join(outdir, cfg["train_id"])
    ckpt = os.path.join(run_dir, "checkpoint-2")
    assert os.path.isdir(os.path.join(ckpt, "opt_state"))

    cfg2 = load_config("configs/smoke_prfl.yaml")
    cfg2["save"]["output_dir"] = outdir
    cfg2["train"]["save_optimizer_state"] = True
    cfg2["model"]["resume_transformer_path"] = ckpt
    state2 = prfl_main(cfg2, max_steps=4)

    def max_count(s):
        import jax
        return max(int(x) for x in jax.tree.leaves(s.opt_state)
                   if hasattr(x, "ndim") and x.ndim == 0
                   and np.issubdtype(x.dtype, np.integer))

    # the restored AdamW state CONTINUES counting (run 1's updates carried
    # over), proving moments were loaded rather than re-initialized
    assert max_count(state2) == 2 * max_count(state)


def test_estimate_serving_recompose_preserves_vae_row(tmp_path):
    """--recompose (no chip access) rebuilds BENCH_SERVING from the stored
    component timings, keeps the once-per-clip vae_decode rows folded in by
    scripts/profile_vae_decode.py, and publishes the end-to-end (sampling +
    W-sharded decode tail) interval from the faster of the fp32/bf16 shard
    decodes."""
    import json
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "BENCH_SERVING.json")
    if not os.path.exists(src):
        pytest.skip("no BENCH_SERVING.json in tree")
    with open(src) as f:
        prev = json.load(f)
    if "vae_decode" not in prev:
        pytest.skip("vae_decode rows not yet measured")
    work = str(tmp_path / "BENCH_SERVING.json")
    shutil.copy(src, work)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["HYV_BENCH_SERVING_PATH"] = work
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "estimate_serving.py"),
         "--recompose"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    with open(work) as f:
        out = json.load(f)
    assert out["vae_decode"] == prev["vae_decode"]
    tail = min(out["vae_decode"]["decode_720p81f_Wshard8_dev_fp32_s"],
               out["vae_decode"]["decode_720p81f_Wshard8_dev_bf16_s"])
    for tag in ("bf16", "int8"):
        row = out[tag]
        base = row.get("chain_interval_chunked_async_s",
                       row.get("chain_interval_s"))
        got = row["end_to_end_with_decode_s"]
        assert got == [round(v + tail, 1) for v in base]
