"""One process of a REAL multi-process jax.distributed pod (CPU Gloo
collectives) driving the actual training CLIs end-to-end.

Launched by tests/test_multihost_pod.py with the rendezvous exported as
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (the generic
launcher contract scripts/_common.maybe_init_distributed forwards — the
JAX analog of the reference's torchrun RANK/WORLD_SIZE rendezvous,
scripts/prfl/train_prfl.py:109-139). Each process owns
xla_force_host_platform_device_count local devices; the global mesh spans
both processes, so every collective in the train step (FSDP weight
all-gathers, Ulysses all-to-alls, gradient all-reduces) actually crosses
process boundaries — the closest runnable analog of a multi-host TPU pod
this 1-chip image allows.

Prints one "POD_RESULT {json}" line: process agreement on the final step
counter and a replicated parameter checksum is the test's assertion.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def usp_sample():
    """USP (ring x ulysses) CFG sampling with the RING axis laid across
    the process boundary: ring=2 x ulysses=4 over 2 processes x 4 local
    devices puts every K/V ring rotation (ppermute) and the attention
    output's ring merge on the cross-process wire — the serving analog of
    a multi-host xfuser deployment (inference_prfl.py:71-82). Returns a
    replicated latent checksum; the test compares it against the SAME
    program run single-process on 8 local devices."""
    import jax
    import jax.numpy as jnp

    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.parallel import sharding as shd
    from hyvideo_prfl_tpu.pipelines.pipeline import GenerateConfig, WanT2V

    # fp32 so pod-vs-single is reduction-order noise, not bf16 compounding
    cfg = wan_dit.tiny_test(remat=False, compute_dtype=jnp.float32,
                            num_heads=4)
    params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim)) * 0.1
    gen = GenerateConfig(sampling_steps=3, shift=3.0)
    mesh = shd.make_usp_mesh(data=1, ring=2, ulysses=4,
                             devices=jax.devices())
    with jax.set_mesh(mesh):
        pipe = WanT2V(cfg, params, shd.usp_policy())
        lat = pipe.generate(jax.random.PRNGKey(2), ctx,
                            jnp.zeros_like(ctx), 4, 8, 8, gen)
        return float(jnp.sum(jnp.abs(lat))), 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trainer", choices=("prfl", "pavrm", "usp_sample"),
                   required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--max_steps", type=int, default=2)
    p.add_argument("--sp_size", type=int, default=2)
    p.add_argument("--save_interval", type=int, default=0,
                   help=">0: exercise the multi-host checkpoint save path")
    args = p.parse_args()

    import jax

    from scripts._common import maybe_init_distributed

    maybe_init_distributed()
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == nproc, (
        f"rendezvous failed: process_count={jax.process_count()} != {nproc}")

    if args.trainer == "usp_sample":
        checksum, step = usp_sample()
        print("POD_RESULT " + json.dumps({
            "process": jax.process_index(),
            "n_processes": jax.process_count(),
            "n_global_devices": len(jax.devices()),
            "n_local_devices": len(jax.local_devices()),
            "step": step,
            "checksum": checksum,
        }), flush=True)
        return

    from hyvideo_prfl_tpu.configs import load_config

    cfg = load_config(args.config)
    cfg["save"]["output_dir"] = args.out
    cfg["dataset"]["sp_size"] = args.sp_size
    cfg["train"]["sanity_check_interval"] = 0
    if args.save_interval > 0:
        cfg["train"]["save_interval"] = args.save_interval
        cfg["train"]["save_optimizer_state"] = True

    if args.trainer == "prfl":
        from scripts.train_prfl import main as trainer_main
    else:
        from scripts.train_pavrm import main as trainer_main
    state = trainer_main(cfg, max_steps=args.max_steps)

    # replicated checksum — jit of global sharded params to ONE scalar; the
    # scalar output is fully replicated, so float() is addressable on every
    # process and must agree bit-for-bit across the pod
    import jax.numpy as jnp

    leaves = [l for l in jax.tree.leaves(state.params)
              if hasattr(l, "dtype")]
    checksum = float(jax.jit(
        lambda ls: sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in ls)
    )(leaves))
    print("POD_RESULT " + json.dumps({
        "process": jax.process_index(),
        "n_processes": jax.process_count(),
        "n_global_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
        "step": int(state.step),
        "checksum": checksum,
    }), flush=True)


if __name__ == "__main__":
    main()
