"""Shared CLI driver plumbing (the basic_init/model_init skeleton of
scripts/prfl/train_prfl.py:109-173 and scripts/pavrm/train_pavrm.py,
re-expressed for a single-controller JAX job over a (data, sp) mesh)."""

from __future__ import annotations

import dataclasses
import logging
import os
import sys
import time
from collections import deque

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyvideo_prfl_tpu.configs import dit_config_for_task  # noqa: E402
from hyvideo_prfl_tpu.parallel import sharding as shd  # noqa: E402


def maybe_init_distributed():
    """Multi-host rendezvous: jax.distributed.initialize when launched under
    a pod scheduler (replaces torchrun's RANK/WORLD_SIZE env rendezvous,
    SURVEY.md 2.8 P10). No-op for single-host runs."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
            logging.info("jax.distributed initialized: process %d/%d",
                         jax.process_index(), jax.process_count())
        except Exception as e:  # already initialized / single host
            logging.info("jax.distributed.initialize skipped: %s", e)


def build_mesh(config):
    maybe_init_distributed()
    n_dev = len(jax.devices())
    sp = max(1, min(int(config.dataset.sp_size), n_dev))
    data = n_dev // sp
    return shd.make_mesh(data=data, sp=sp, devices=jax.devices()[: data * sp])


def dit_cfg_from(config, **overrides):
    cfg = dit_config_for_task(config.task, **overrides)
    ov = config.get_path("model.override")
    if ov:
        cfg = dataclasses.replace(cfg, **{k: tuple(v) if isinstance(v, list)
                                          else v for k, v in ov.items()})
    return cfg


class StepTimer:
    """Moving-average step timing (train_prfl.py:1127-1183)."""

    def __init__(self, maxlen=100):
        self.times = deque(maxlen=maxlen)
        self.t0 = None

    def tic(self):
        self.t0 = time.perf_counter()

    def toc(self):
        dt = time.perf_counter() - self.t0
        self.times.append(dt)
        return dt

    @property
    def avg(self):
        return sum(self.times) / max(len(self.times), 1)


class MetricLogger:
    """log.txt + TensorBoard scalars (train_prfl.py:1036-1081)."""

    def __init__(self, log_dir):
        self.writer = None
        os.makedirs(log_dir, exist_ok=True)
        # append-only text log like the reference's log.txt
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logging.getLogger().addHandler(fh)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir)
        except Exception:
            logging.info("tensorboard unavailable; logging to text only")

    def log(self, step, metrics, prefix="train"):
        parts = " | ".join(f"{k}={float(v):.5f}" for k, v in metrics.items())
        logging.info("step %6d | %s", step, parts)
        if self.writer:
            for k, v in metrics.items():
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)
