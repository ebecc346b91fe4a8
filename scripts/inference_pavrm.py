"""PAVRM reward-model evaluation CLI.

Parity target: `scripts/pavrm/inference_pavrm.py` (:1-737): load the trimmed
DiT + heads, run the reward forward at fixed timestep buckets
[(0,200), (201,400), (401,600), (601,800), (801,1000)] over a val meta list,
and report accuracy/precision/recall/F1 per bucket (:696-726).

    python scripts/inference_pavrm.py --config_path configs/infer_pavrm_i2v_720.yaml
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts._common import batched_eval, build_mesh, dit_cfg_from
from hyvideo_prfl_tpu.configs import load_config
from hyvideo_prfl_tpu.data.dataset import LatentCacheDataset
from hyvideo_prfl_tpu.training import common
from hyvideo_prfl_tpu.training.pavrm import (
    PavrmConfig, PavrmModel, classification_metrics, make_eval_step,
)
from hyvideo_prfl_tpu.utils import checkpoint as ck

TIMESTEP_BUCKETS = [(0, 200), (201, 400), (401, 600), (601, 800), (801, 1000)]


def main(config, max_samples=None):
    logging.basicConfig(level=logging.INFO)
    mesh = build_mesh(config)
    is_i2v = "i2v" in config.task or "flf2v" in config.task
    dit_cfg = dit_cfg_from(config)
    pc = PavrmConfig(
        loss="ce",
        pool=config.lrm.pool,
        feature_layer=tuple(config.lrm.feature_layer),
        num_queries=config.lrm.query_attention.num_queries,
        num_heads=config.lrm.query_attention.num_heads,
        return_type=config.lrm.query_attention.return_type,
    )
    model = PavrmModel(dit_cfg, pc)

    rng = jax.random.PRNGKey(config.eval.seed)
    lrm_path = config.model.lrm_transformer_path or config.model.base_path
    if lrm_path and os.path.isdir(lrm_path):
        full = ck.load_wan_checkpoint(lrm_path, dit_cfg)
        trimmed = common.slice_blocks(full, model.dit_cfg.num_layers)
        trainable = {"blocks": trimmed["params"]["blocks"]}
        frozen = {"params": {k: v for k, v in trimmed["params"].items()
                             if k != "blocks"}}
        qp = ck.load_reward_head(
            config.model.lrm_query_attention_path, "qattn")
        mp = ck.load_reward_head(config.model.lrm_mlp_path, "mlp")
        trainable["q_attn"] = qp["params"]
        trainable["mlp"] = mp["params"]
    else:
        logging.info("no LRM checkpoint; random init (smoke mode)")
        trainable, frozen = model.init_all(rng)

    meta_lists = (list(config.dataset.val_meta_file_list)
                  or list(config.dataset.meta_file_list))
    dataset = LatentCacheDataset(
        "lrm_ce", meta_file_list=meta_lists, label_key=config.lrm.task,
        text_len=config.extra_model.get_path("text_encoder.t5_text_len", 512),
        null_dir=config.dataset.null_dir, is_i2v=is_i2v,
        seed=config.eval.seed,
    )
    eval_fn = make_eval_step(model)

    with jax.set_mesh(mesh):
        eval_fn = jax.jit(eval_fn, static_argnums=(4,))
        results = {}
        per_t = batched_eval(
            eval_fn, trainable, frozen, dataset,
            list(config.eval.timestep), config.eval.seed,
            batch_size=int(config.eval.get("batch_size") or 8),
            max_samples=max_samples)
        for t_val in config.eval.timestep:
            probs, labels = per_t[float(t_val)]
            m = classification_metrics(np.asarray(probs), np.asarray(labels))
            bucket = next((b for b in TIMESTEP_BUCKETS
                           if b[0] <= t_val <= b[1]), None)
            results[f"t={t_val}"] = {**m, "bucket": str(bucket),
                                     "mean_reward": float(np.mean(probs))}
            logging.info("t=%s: %s", t_val, results[f"t={t_val}"])
        print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--max_samples", type=int, default=None)
    args = p.parse_args()
    main(load_config(args.config_path), max_samples=args.max_samples)
