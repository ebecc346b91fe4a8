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
    SURVEY.md 2.8 P10). No-op for single-host runs.

    On TPU pods jax.distributed.initialize() self-discovers the topology;
    generic launchers (torchrun-style) instead export
    JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID, which we
    forward explicitly (this is also how tests/test_multihost_pod.py runs a
    REAL 2-process pod over CPU Gloo collectives)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        kwargs = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        try:
            jax.distributed.initialize(**kwargs)
            logging.info("jax.distributed initialized: process %d/%d",
                         jax.process_index(), jax.process_count())
        except Exception as e:  # already initialized / single host
            logging.info("jax.distributed.initialize skipped: %s", e)


def fetch_full(tree):
    """Full host copy of a (possibly cross-process sharded) array tree.

    Single-controller: plain device_get. Multi-host pods: every process
    participates in a process_allgather (collective — call from ALL
    processes, then gate the file writes on jax.process_index()==0). This
    is the FSDP FULL_STATE_DICT + rank0-save analog of the reference's
    model_utils.py:38-67 / fsdp_utils.py state_dict gathering."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)


def _pod_warmup(mesh):
    """Create the cross-process communicator contexts BEFORE the first big
    dispatch. XLA CPU's Gloo rendezvous has a hard 30 s key-value timeout
    that only applies to context CREATION (later collectives reuse the
    connected context — verified empirically with a 45 s-skewed collective
    after warmup); without this, per-process compile-time variance on the
    first train step (minutes, load-dependent) desyncs the first
    collective's rendezvous and kills the pod. The coordination-service
    barrier (pure RPC, no data plane) aligns the warmup dispatch itself."""
    if jax.process_count() <= 1:
        return
    import numpy as np
    from jax._src import distributed
    from jax.sharding import NamedSharding, PartitionSpec as P

    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier("hyv_pod_warmup", 600_000)
    import jax.numpy as jnp

    x = jax.device_put(
        np.arange(mesh.devices.size, dtype=np.float32),
        NamedSharding(mesh, P(mesh.axis_names)))
    got = float(jax.jit(jnp.sum)(x))
    want = mesh.devices.size * (mesh.devices.size - 1) / 2.0
    assert got == want, f"pod warmup collective wrong: {got} != {want}"
    logging.info("pod warmup collective OK across %d processes",
                 jax.process_count())


def build_mesh(config):
    chunks = int(config.get_path("train.ulysses_chunks")
                 or os.environ.get("HYV_ULYSSES_CHUNKS", "1"))
    if chunks > 1:
        # before backend init: libtpu reads LIBTPU_INIT_ARGS once; the
        # chunked Ulysses sandwich (ops/attention.ulysses_chunks) then
        # overlaps its a2a windows with the flash kernels
        os.environ["HYV_ULYSSES_CHUNKS"] = str(chunks)
        shd.enable_async_collectives()
    maybe_init_distributed()
    n_dev = len(jax.devices())
    sp = max(1, min(int(config.dataset.sp_size), n_dev))
    data = n_dev // sp
    mesh = shd.make_mesh(data=data, sp=sp,
                         devices=jax.devices()[: data * sp])
    _pod_warmup(mesh)
    return mesh


def fsdp_strategy_from(config) -> str:
    """model.fsdp.fsdp_sharding_startegy [sic] — the reference YAML key
    (fsdp_utils.py:86-101); the correctly-spelled variant also accepted."""
    s = (config.get_path("model.fsdp.fsdp_sharding_startegy")
         or config.get_path("model.fsdp.fsdp_sharding_strategy") or "full")
    return str(s)


def make_sharded_state(mesh, params, tx, offload_opt: bool = False,
                       strategy: str = "full"):
    """(TrainState, opt_transfer, state_shardings): params sharded over the
    mesh per the FSDP strategy (shd.FSDP_STRATEGIES; reference
    fsdp_utils.py:86-101), optimizer moments sharded per the same strategy
    (zero2-style strategies shard moments under replicated params), and the
    optimizer state optionally stored in pinned host memory
    (training/common.apply_grads streams it on-device per step).

    state_shardings pins the jitted step's out_shardings: without it GSPMD
    picks different layouts for the donated output state than the input,
    and every step recompiles (observed: the smoke CLIs paying the full
    refl compile twice)."""
    import jax
    import jax.numpy as jnp

    from hyvideo_prfl_tpu.training import common

    if mesh.devices.size <= 1:
        return common.init_train_state(params, tx), None, None
    pshard = shd.fsdp_param_sharding(mesh, params, strategy=strategy)
    params = jax.device_put(params, pshard)
    pshapes = jax.eval_shape(lambda: params)
    dev, host = shd.opt_state_shardings(mesh, pshapes, pshard, tx,
                                        strategy=strategy)
    opt_state = jax.device_put(tx.init(params), host if offload_opt else dev)
    state = common.TrainState(params=params, opt_state=opt_state,
                              step=jnp.zeros((), jnp.int32))
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def sh_of(x):
        # scalars (step counter, optax counts) come back single-device;
        # out_shardings must reference the mesh uniformly
        s = x.sharding
        return s if isinstance(s, NamedSharding) else rep

    state_shardings = jax.tree.map(sh_of, state)
    transfer = (dev, host) if offload_opt else None
    return state, transfer, state_shardings


def _rows_for_process(procs, me: int) -> list:
    """Rows of a [data, rest] process-index matrix owned entirely by `me`;
    a row spanning processes is a layout error."""
    local = []
    for r in range(procs.shape[0]):
        owners = set(int(p) for p in procs[r].ravel())
        if me in owners:
            assert owners == {me}, (
                f"data row {r} spans processes {owners}; lay the mesh out "
                "with the data axis outermost across hosts")
            local.append(r)
    return local


def local_replica_rows(mesh) -> list:
    """Data-axis rows owned by this process (multi-host pods): replica r
    lives on mesh.devices[r, ...] (data outermost over hosts)."""
    import numpy as np

    rows = mesh.devices.reshape(mesh.shape[shd.DATA_AXIS], -1)
    procs = np.vectorize(lambda d: d.process_index)(rows)
    return _rows_for_process(procs, jax.process_index())


def shard_batch_fn(mesh):
    """Batch -> P("data", ...) leading-axis sharding — the mesh analog of
    the reference's per-rank DataLoader placement (train_prfl.py:455-464).

    Single-controller: plain device_put of the global batch. Multi-host
    pods: each process supplies only its LOCAL data rows and
    jax.make_array_from_process_local_data assembles the global array.
    Non-array fields (caption strings) pass through."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(shd.DATA_AXIS))
    multi_host = jax.process_count() > 1

    def to_device(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, list):
                out[k] = v
            elif multi_host:
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            else:
                out[k] = jax.device_put(v, sharding)
        return out

    return to_device


def make_train_loader(config, dataset, mesh, start_index: int = 0):
    """The data pump for a training CLI: num_replicas = mesh "data" axis
    (world // sp in the reference, train_prfl.py:455-464), per-replica
    contiguous blocks zipped into one global batch, device_put with a
    P("data", ...) sharding. Single-replica runs additionally bucket
    mixed-shape caches (one compile per shape bucket)."""
    from hyvideo_prfl_tpu.data.loader import (
        BatchIterator, BlockDistributedSampler, DataParallelLoader,
    )

    data_size = mesh.shape[shd.DATA_AXIS]
    sp_size = mesh.shape[shd.SP_AXIS]
    # raw resume offsets wrap inside BlockDistributedSampler (per-replica)
    batch_size = config.dataset.batch_size
    shuffle = bool(config.dataset.get("shuffle", False))
    seed = config.train.seed
    to_device = shard_batch_fn(mesh) if mesh.devices.size > 1 else None
    if data_size > 1:
        # multi-host pods: this process iterates only its local data rows
        # (replica_ranks); make_array_from_process_local_data assembles the
        # global batch in shard_batch_fn
        ranks = (local_replica_rows(mesh) if jax.process_count() > 1
                 else list(range(data_size)))
        return iter(DataParallelLoader(
            dataset, num_replicas=data_size, batch_size=batch_size,
            start_index=start_index, shuffle=shuffle, seed=seed,
            sp_size=sp_size, to_device=to_device, replica_ranks=ranks,
        ))
    sampler = BlockDistributedSampler(
        len(dataset), 1, 0, start_index=start_index, shuffle=shuffle,
        seed=seed,
    )
    return iter(BatchIterator(
        dataset, sampler, batch_size=batch_size, sp_size=sp_size,
        group_by_shape=True, to_device=to_device,
    ))


def dit_cfg_from(config, **overrides):
    cfg = dit_config_for_task(config.task, **overrides)
    # reference YAML schema: model.gradient_checkpointing toggles remat
    # (fsdp_utils.py:23-50); model.remat_policy is our extension selecting
    # the policy ("full" | "dots" | "dots_all" | "attn" — wan_dit.WanConfig)
    gc = config.get_path("model.gradient_checkpointing")
    if gc is not None:
        cfg = dataclasses.replace(cfg, remat=bool(gc))
    rp = config.get_path("model.remat_policy")
    if rp:
        cfg = dataclasses.replace(cfg, remat_policy=str(rp))
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
    """log.txt + TensorBoard scalars (train_prfl.py:1036-1081). On pods
    only process 0 writes (the reference's rank-gated main_print /
    SummaryWriter, train_prfl.py:76-80,1036); other processes still format
    to their own stderr logger but own no files."""

    _live = None  # the MetricLogger currently owning the root file handler

    def __init__(self, log_dir):
        self.writer = None
        # metric lines go out at INFO; basicConfig in the trainer mains is
        # a no-op when a host process (e.g. pytest) already configured
        # handlers, leaving root at WARNING and log.txt empty — set the
        # level explicitly so the reference's log.txt contract holds
        # regardless of the embedding process
        logging.getLogger().setLevel(logging.INFO)
        if jax.process_index() != 0:
            return
        os.makedirs(log_dir, exist_ok=True)
        root = logging.getLogger()
        # a previous trainer main() in this process (e.g. the PAVRM->PRFL
        # handoff chain, or back-to-back test runs) left its file handler
        # attached — detach it, or every later line would also be appended
        # to the OLD run's log.txt
        for h in list(root.handlers):
            if getattr(h, "_hyv_metric_logger", False):
                root.removeHandler(h)
                h.close()
        # close the previous run's TensorBoard writer as well: SummaryWriter
        # only flushes periodically/on close, so leaving it open can drop
        # the old run's tail scalars
        prev = MetricLogger._live
        if prev is not None and prev.writer is not None:
            prev.writer.close()
            prev.writer = None
        MetricLogger._live = self
        # append-only text log like the reference's log.txt
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        fh._hyv_metric_logger = True
        root.addHandler(fh)
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


def batched_eval(jitted_eval, trainable, frozen, dataset, timesteps, seed,
                 batch_size=8, max_samples=None, put=None):
    """Shape-bucketed, [B]-batched PAVRM eval (VERDICT r2 item 5).

    The reference batches its val loop and all_gathers predictions
    (train_pavrm.py:1202-1253); the round-2 drivers iterated batch-1 jits
    per sample per timestep — unusable on a 40s-per-dispatch remote
    backend. This makes ONE data pass (each val sample loaded once),
    groups samples into same-shape batches (one compile per latent-shape
    bucket), pads the last partial batch for compile reuse, and issues
    len(timesteps) * ceil(N/B) jitted dispatches total.

    Returns {float(t): (probs list[N], labels list[N])}.
    """
    import numpy as np
    import jax.numpy as jnp

    n = min(len(dataset), max_samples or len(dataset))
    buckets = {}
    for i in range(n):
        s = dataset[i]
        buckets.setdefault(tuple(np.asarray(s["latents"]).shape), []).append(s)
    out = {float(t): ([], []) for t in timesteps}
    for samples in buckets.values():
        for j in range(0, len(samples), batch_size):
            chunk = samples[j:j + batch_size]
            nb = len(chunk)
            pad = batch_size - nb if len(samples) > batch_size else 0

            def stack(k):
                arr = np.stack([np.asarray(s[k]) for s in chunk])
                if pad:
                    arr = np.concatenate(
                        [arr, np.repeat(arr[-1:], pad, axis=0)])
                # pods: batches must be GLOBAL (replicated) arrays — every
                # process builds the identical batch (deterministic dataset
                # order) and `put` places it with a replicated
                # NamedSharding; a process-local jnp.asarray would clash
                # with the cross-process params inside the jit
                return put(arr) if put is not None else jnp.asarray(arr)

            batch = {k: stack(k) for k in chunk[0]
                     if not isinstance(chunk[0][k], str) and k != "labels"}
            labels = [float(s["labels"]) for s in chunk]
            for t in timesteps:
                p = jitted_eval(trainable, frozen, batch, jnp.float32(t),
                                int(seed))
                probs, labs = out[float(t)]
                probs.extend(np.asarray(p)[:nb].tolist())
                labs.extend(labels)
    return out
