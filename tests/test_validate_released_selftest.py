"""Keep the released-weight validation harness standing (VERDICT r4 next
#8: "validate_released stays standing and non-skippable").

The harness (scripts/validate_released.py) is the only path to the north
star's parity clause the day real checkpoints land; --selftest fabricates
tiny reference-format weights via the inverse converters and drives ALL
stages end-to-end (convert + roundtrip + sample-to-mp4 + PAVRM reward eval
+ the int8 PSNR gate). Running it in the suite makes "stays green in CI"
literally true rather than a manual per-round claim.
"""

import json
import os
import re
import subprocess
import sys


def test_validate_released_selftest(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "validate_released.py"),
         "--selftest", "--out_dir", str(tmp_path / "out")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1500)
    tail = (r.stdout + r.stderr)[-3000:]
    assert r.returncode == 0, f"selftest failed rc={r.returncode}:\n{tail}"
    # the harness prints "stages: N ran, M skipped [...]" last — all stages
    # must run (skips would silently hollow out the weights-day gate)
    line = [l for l in r.stdout.splitlines() if l.startswith("stages:")]
    assert line, f"no stages summary:\n{tail}"
    m = re.search(r"stages:\s*(\d+) ran,\s*(\d+) skipped", line[-1])
    assert m, line[-1]
    assert int(m.group(1)) >= 11, line[-1]
    assert int(m.group(2)) == 0, line[-1]
    report = tmp_path / "out" / "validation_report.json"
    assert report.exists()
    rep = json.load(open(report))
    assert rep, "empty validation report"
