"""Drive BOTH trainer CLIs on the real TPU chip (VERDICT r4 next #3).

The torchrun drivers are the reference's product surface
(/root/reference/scripts/prfl/train_prfl.py:1190-1199); until round 5 our
equivalents had only ever executed on the CPU mesh, and this repo has
documented precedent for on-chip-only breakage (the Mosaic (1,d)-block
batch>1 lowering bug, the axon HBM non-release hazard). This script runs,
on the real chip, for each trainer:

  phase 1: a fresh-process smoke run (max_steps=2) that writes
           checkpoint-2 + exact AdamW moments,
  phase 2: a fresh-process resume from checkpoint-2 (max_steps=4) that
           must CONTINUE the optimizer update count (moments loaded, not
           re-initialized) and keep losses finite.

Each phase is its own subprocess per the axon HBM non-release pattern
(CLAUDE.md): sequential big phases in one process OOM the chip.

Usage (on the TPU host):  python scripts/validate_tpu_trainers.py
Exits non-zero on any failure; prints one JSON verdict per phase.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax
from hyvideo_prfl_tpu.configs import load_config

which, outdir, resume, max_steps = ({which!r}, {outdir!r}, {resume!r},
                                    {max_steps})
cfg = load_config(os.path.join({repo!r}, "configs",
                               "smoke_" + which + ".yaml"))
cfg["save"]["output_dir"] = outdir
cfg["train"]["save_interval"] = 2
cfg["train"]["save_optimizer_state"] = True
if resume:
    cfg["model"]["resume_transformer_path"] = resume
if which == "prfl":
    from scripts.train_prfl import main
else:
    from scripts.train_pavrm import main
state = main(cfg, max_steps=max_steps)

def max_count(s):
    return max(int(x) for x in jax.tree.leaves(s.opt_state)
               if hasattr(x, "ndim") and x.ndim == 0
               and np.issubdtype(x.dtype, np.integer))

finite = all(bool(np.isfinite(np.asarray(l)).all())
             for l in jax.tree.leaves(state.params))
print("PHASE_RESULT " + json.dumps({{
    "which": which, "resumed": bool(resume), "step": int(state.step),
    "backend": jax.default_backend(),
    "opt_updates": max_count(state), "params_finite": finite}}))
"""


def run_phase(which: str, outdir: str, resume: str = "",
              max_steps: int = 2) -> dict:
    code = CHILD.format(repo=REPO, which=which, outdir=outdir,
                        resume=resume, max_steps=max_steps)
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       capture_output=True, text=True, timeout=3600)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"{which} phase rc={r.returncode}")
    for line in r.stdout.splitlines():
        if line.startswith("PHASE_RESULT "):
            return json.loads(line[len("PHASE_RESULT "):])
    raise RuntimeError(f"{which}: no PHASE_RESULT line")


def main():
    # deliberately NO jax import here: initializing the backend in this
    # parent would hold the (remote) chip against the child phases, which
    # each resolve their own backend in a fresh process and report it in
    # their PHASE_RESULT line
    failures = []
    results = {}
    for which, train_id in (("prfl", "smoke_prfl"),
                            ("pavrm", "smoke_pavrm")):
        outdir = tempfile.mkdtemp(prefix=f"tpu_{which}_")
        r1 = run_phase(which, outdir, max_steps=2)
        ckpt = os.path.join(outdir, train_id, "checkpoint-2")
        opt_ok = (os.path.isdir(os.path.join(ckpt, "opt_state"))
                  if which == "prfl" else os.path.isdir(ckpt + "-opt"))
        if not (os.path.isdir(ckpt) and opt_ok):
            failures.append(f"{which}: checkpoint-2/opt missing")
        r2 = run_phase(which, outdir, resume=ckpt, max_steps=4)
        if not (r1["params_finite"] and r2["params_finite"]):
            failures.append(f"{which}: non-finite params")
        # state.step counts OPTIMIZER updates: pavrm = 1/outer step, prfl
        # = 2 (refl + sft); a clean resume doubles the first run's count
        if r2["step"] != 2 * r1["step"]:
            failures.append(f"{which}: resume step {r2['step']} != "
                            f"2x{r1['step']}")
        if r2["opt_updates"] != 2 * r1["opt_updates"]:
            failures.append(
                f"{which}: opt updates {r2['opt_updates']} != "
                f"2x{r1['opt_updates']} — moments not restored")
        results[which] = {"run": r1, "resume": r2,
                          "checkpoint": os.path.isdir(ckpt)}
        print(json.dumps({which: results[which]}), flush=True)
    verdict = {"ok": not failures, "failures": failures}
    print(json.dumps(verdict), flush=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
