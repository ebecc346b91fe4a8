"""REAL multi-process pod smoke: 2 jax.distributed processes x 4 local CPU
devices = one 8-device global mesh, cross-process collectives over Gloo.

This executes (not simulates) the multi-host code paths that previously
could only be dead-reckoned on the 1-chip harness (SURVEY.md 2.8 P1/P10):

  * scripts/_common.maybe_init_distributed generic-launcher rendezvous
    (JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID — the
    torchrun RANK/WORLD_SIZE analog, reference train_prfl.py:109-139)
  * local_replica_rows: each process pumps only its own data-axis rows
  * jax.make_array_from_process_local_data global batch assembly
  * the full jitted refl+SFT / PAVRM train steps whose FSDP weight
    all-gathers and gradient all-reduces cross process boundaries
  * process-0-gated logging and (with save_interval) the multi-host
    checkpoint save path (process_allgather + rank-0 writes, the FSDP
    FULL_STATE_DICT rank0 analog of reference model_utils.py:38-67)

Both processes must exit 0 and print identical replicated checksums: a
divergent step or desynced collective shows up as a hang (timeout) or a
checksum mismatch.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_pod(trainer: str, config: str, tmp_path, n_proc: int = 2,
            local_devices: int = 4, max_steps: int = 2, sp_size: int = 2,
            save_interval: int = 0, timeout: int = 1200):
    port = _free_port()
    out_dir = str(tmp_path / "outputs")
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={local_devices}")
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(n_proc)
        env["JAX_PROCESS_ID"] = str(pid)
        cmd = [sys.executable, os.path.join(REPO, "tests", "_pod_worker.py"),
               "--trainer", trainer, "--config", config, "--out", out_dir,
               "--max_steps", str(max_steps), "--sp_size", str(sp_size),
               "--save_interval", str(save_interval)]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    results = []
    for pid, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"pod process {pid} timed out (collective desync?)")
        assert proc.returncode == 0, (
            f"pod process {pid} failed rc={proc.returncode}:\n{out[-4000:]}")
        line = [l for l in out.splitlines() if l.startswith("POD_RESULT ")]
        assert line, f"process {pid} printed no POD_RESULT:\n{out[-4000:]}"
        results.append(json.loads(line[-1][len("POD_RESULT "):]))
    return results, out_dir


def test_prfl_pod_2proc(tmp_path):
    """Full PRFL (refl rollout + grad + LRM reward + SFT + EMA) over a
    (data=4, sp=2) mesh split across 2 processes."""
    results, _ = run_pod("prfl", "configs/smoke_prfl.yaml", tmp_path)
    assert [r["process"] for r in results] == [0, 1]
    for r in results:
        assert r["n_processes"] == 2
        assert r["n_global_devices"] == 8
        assert r["n_local_devices"] == 4
        assert r["step"] == results[0]["step"] > 0
        assert r["checksum"] == results[0]["checksum"]


def test_usp_sampling_pod_matches_single_process(tmp_path):
    """USP serving with the RING axis across the process boundary:
    ring=2 x ulysses=4 sampling on a 2-process pod must match the same
    8-device program run in one process (xfuser multi-host serving
    analog) — every K/V ring ppermute crosses the pod wire."""
    pod, _ = run_pod("usp_sample", "configs/smoke_prfl.yaml", tmp_path,
                     n_proc=2, local_devices=4)
    single, _ = run_pod("usp_sample", "configs/smoke_prfl.yaml", tmp_path,
                        n_proc=1, local_devices=8)
    assert pod[0]["checksum"] == pod[1]["checksum"]
    assert pod[0]["n_global_devices"] == single[0]["n_global_devices"] == 8
    # fp32 compute: pod-vs-single differs only by collective reduction
    # order
    assert pod[0]["checksum"] == pytest.approx(single[0]["checksum"],
                                               rel=1e-5)


def test_pavrm_pod_2proc_with_save(tmp_path):
    """PAVRM trainer across 2 processes, including the multi-host
    checkpoint save (process_allgather + rank-0 file writes)."""
    results, out_dir = run_pod(
        "pavrm", "configs/smoke_pavrm.yaml", tmp_path, save_interval=2)
    for r in results:
        assert r["checksum"] == results[0]["checksum"]
    ckpt_dirs = []
    for root, dirs, _ in os.walk(out_dir):
        ckpt_dirs += [os.path.join(root, d) for d in dirs
                      if d.startswith("checkpoint-")]
    assert ckpt_dirs, f"no checkpoint written under {out_dir}"
