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


def test_train_prfl_t2v_cli(outdir):
    from scripts.train_prfl import main as prfl_main

    cfg = load_config("configs/smoke_prfl.yaml")
    cfg["save"]["output_dir"] = outdir
    state = prfl_main(cfg, max_steps=2)
    _finite_log_losses(state)
