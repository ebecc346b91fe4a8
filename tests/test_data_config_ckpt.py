"""Data layer, config loader, and checkpoint interop tests."""

import json
import os

import numpy as np
import pytest

from hyvideo_prfl_tpu.configs import (
    load_config, dit_config_for_task, WAN_CONFIGS, SIZE_CONFIGS,
)
from hyvideo_prfl_tpu.data.dataset import LatentCacheDataset, coerce_label
from hyvideo_prfl_tpu.data.loader import (
    BlockDistributedSampler, BatchIterator, stack_batch,
)


@pytest.fixture()
def fixture_dataset(tmp_path):
    """Synthetic latent cache in the reference's on-disk format."""
    lat_dir = tmp_path / "latents"
    meta_dir = tmp_path / "meta"
    null_dir = tmp_path / "null" / "wanx"
    for d in (lat_dir, meta_dir, null_dir):
        d.mkdir(parents=True)
    np.save(null_dir / "null.npy", np.zeros((1, 1, 4096), np.float32))
    np.save(null_dir / "uncond.npy", np.random.randn(1, 20, 4096).astype(np.float32))

    metas = []
    for i in range(6):
        base = f"clip{i}"
        lat = np.random.randn(1, 16, 3, 8, 8).astype(np.float32)
        np.save(lat_dir / f"{base}.npy", lat)
        np.save(lat_dir / f"{base}_f1_black.npy", lat * 0.5)
        np.save(lat_dir / f"{base}_img_clip.npy",
                np.random.randn(1, 257, 1280).astype(np.float32))
        np.save(lat_dir / f"{base}_textshort.npy",
                np.random.randn(1, 12, 4096).astype(np.float32))
        np.save(lat_dir / f"{base}_textlong.npy",
                np.random.randn(1, 40, 4096).astype(np.float32))
        meta = {
            "source_id": base,
            "short_caption": f"short {i}",
            "long_caption": f"long {i}",
            "vae_latent_path": str(lat_dir / f"{base}.npy"),
            "f1_black_path": str(lat_dir / f"{base}_f1_black.npy"),
            "imgclip_path": str(lat_dir / f"{base}_img_clip.npy"),
            "textshort_path": str(lat_dir / f"{base}_textshort.npy"),
            "textlong_path": str(lat_dir / f"{base}_textlong.npy"),
            "motion_quality": "good" if i % 2 == 0 else "poor",
        }
        mpath = meta_dir / f"{base}_meta_v1.json"
        mpath.write_text(json.dumps(meta))
        metas.append(str(mpath))
    list_file = tmp_path / "data.list"
    list_file.write_text("\n".join(metas))
    return tmp_path, str(list_file)


def test_refl_dataset_shapes(fixture_dataset):
    root, list_file = fixture_dataset
    ds = LatentCacheDataset(
        "refl", [list_file], text_len=64,
        null_dir=str(root / "null"), seed=0,
    )
    s = ds[0]
    assert s["latents"].shape == (3, 8, 8, 16)  # THWC
    assert s["text"].shape == (64, 4096)
    assert s["uncond_text"].shape == (64, 4096)
    assert s["cond"].shape == (3, 8, 8, 16)
    assert s["clip_fea"].shape == (257, 1280)
    assert isinstance(s["prompt"], str)


def test_ce_dataset_labels(fixture_dataset):
    root, list_file = fixture_dataset
    ds = LatentCacheDataset(
        "lrm_ce", [list_file], text_len=32,
        null_dir=str(root / "null"), label_key="motion_quality", seed=0,
    )
    labels = [float(ds[i]["labels"]) for i in range(6)]
    assert labels == [1.0, 0.0, 1.0, 0.0, 1.0, 0.0]


def test_bt_dataset(fixture_dataset):
    root, list_file = fixture_dataset
    ds = LatentCacheDataset(
        "lrm_bt_online", [list_file], meta_file_lose_list=[list_file],
        text_len=32, null_dir=str(root / "null"), seed=1,
    )
    s = ds[0]
    assert s["latents_lose"].shape == s["latents"].shape


def test_bad_data_retry(fixture_dataset, tmp_path):
    root, list_file = fixture_dataset
    # corrupt one meta path: point to a nonexistent file
    broken = tmp_path / "broken.json"
    broken.write_text(json.dumps({"vae_latent_path": "/nonexistent.npy"}))
    lines = open(list_file).read().splitlines()
    lines[0] = str(broken)
    lf2 = tmp_path / "data2.list"
    lf2.write_text("\n".join(lines))
    ds = LatentCacheDataset("refl", [str(lf2)], text_len=32,
                            null_dir=str(root / "null"), seed=0)
    s = ds[0]  # must resample another index instead of crashing
    assert s["latents"].shape == (3, 8, 8, 16)


def test_block_sampler_partition_and_resume():
    s0 = BlockDistributedSampler(100, num_replicas=4, rank=0)
    s3 = BlockDistributedSampler(100, num_replicas=4, rank=3)
    assert list(s0)[:3] == [0, 1, 2]
    assert list(s3)[:3] == [75, 76, 77]
    sr = BlockDistributedSampler(100, num_replicas=4, rank=1, start_index=10)
    assert list(sr)[0] == 35
    assert len(sr) == 15


def test_batch_iterator_wraps_epochs(fixture_dataset):
    root, list_file = fixture_dataset
    ds = LatentCacheDataset("refl", [list_file], text_len=32,
                            null_dir=str(root / "null"), seed=0)
    sampler = BlockDistributedSampler(len(ds), 1, 0)
    it = iter(BatchIterator(ds, sampler, batch_size=2, prefetch=0))
    for _ in range(5):  # 6 samples / batch 2 = 3 batches per epoch; wraps
        b = next(it)
        assert b["latents"].shape == (2, 3, 8, 8, 16)
        assert len(b["prompt"]) == 2


def test_bad_data_retry_any_exception(fixture_dataset, tmp_path):
    """Truncated/corrupt npy (not just missing files) resamples — the
    reference catches any per-sample exception 100x
    (image2video_dataset.py:53-68)."""
    root, list_file = fixture_dataset
    corrupt = tmp_path / "corrupt.npy"
    corrupt.write_bytes(b"\x93NUMPY garbage")
    broken = tmp_path / "broken.json"
    broken.write_text(json.dumps({
        "vae_latent_path": str(corrupt),
        "textshort_path": str(corrupt), "textlong_path": str(corrupt),
    }))
    lines = open(list_file).read().splitlines()
    lines[0] = str(broken)
    lf2 = tmp_path / "data3.list"
    lf2.write_text("\n".join(lines))
    ds = LatentCacheDataset("refl", [str(lf2)], text_len=32,
                            null_dir=str(root / "null"), seed=0)
    s = ds[0]
    assert s["latents"].shape == (3, 8, 8, 16)


def test_sampler_reshuffles_per_epoch():
    s = BlockDistributedSampler(64, 1, 0, shuffle=True, seed=3)
    s.set_epoch(0)
    e0 = list(s)
    s.set_epoch(1)
    e1 = list(s)
    assert sorted(e0) == sorted(e1) == list(range(64))
    assert e0 != e1  # reseeded per epoch (reference sampler semantics)


def test_batch_iterator_shape_buckets():
    """Mixed-shape caches batch per shape bucket instead of crashing
    stack_batch (the static-shape analog of pad-to-seq_len,
    model.py:578-587)."""

    class MixedDs:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            f = 3 if i % 2 == 0 else 5
            return {"latents": np.zeros((f, 8, 8, 16), np.float32),
                    "text": np.zeros((4, 8), np.float32)}

    sampler = BlockDistributedSampler(8, 1, 0)
    it = iter(BatchIterator(MixedDs(), sampler, batch_size=2, prefetch=0,
                            group_by_shape=True))
    shapes = [next(it)["latents"].shape for _ in range(4)]
    assert all(s in ((2, 3, 8, 8, 16), (2, 5, 8, 8, 16)) for s in shapes)
    assert {s[1] for s in shapes} == {3, 5}


def test_batch_iterator_sp_divisibility_skip():
    """Samples whose token count isn't divisible by sp_size are skipped
    (data_utils.py:515-524)."""

    class Ds:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            # even i: 3*4*4=48 tokens (divisible by 4);
            # odd i: 3*1*1=3 tokens (not divisible) -> skipped
            h, w = (8, 8) if i % 2 == 0 else (2, 2)
            return {"latents": np.zeros((3, h, w, 16), np.float32),
                    "idx": np.asarray(i)}

    sampler = BlockDistributedSampler(6, 1, 0)
    it = iter(BatchIterator(Ds(), sampler, batch_size=2, prefetch=0,
                            sp_size=4))
    b = next(it)
    assert all(i % 2 == 0 for i in b["idx"].tolist())


def test_data_parallel_loader_blocks(fixture_dataset):
    """Global batch = concat of per-replica contiguous-block streams,
    replica-major (train_prfl.py:455-464 stream semantics)."""
    from hyvideo_prfl_tpu.data.loader import DataParallelLoader

    class IdxDs:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"idx": np.asarray(i)}

    loader = iter(DataParallelLoader(IdxDs(), num_replicas=2, batch_size=2,
                                     prefetch=0))
    b = next(loader)
    assert b["idx"].tolist() == [0, 1, 4, 5]
    b = next(loader)
    assert b["idx"].tolist() == [2, 3, 6, 7]


def test_config_loads_reference_schema(tmp_path):
    cfg = load_config("configs/train_prfl_i2v_720.yaml")
    assert cfg.task == "i2v-14b-720p"
    assert cfg.dataset.sp_size == 4
    assert cfg.model.fsdp.fsdp_sharding_startegy == "full"
    assert cfg.lrm.feature_layer == [8]
    assert cfg.lrm.trainable_blocks == list(range(8))
    assert cfg.extra_model.scheduler.flow_shift == 5.0
    assert cfg.train.gradient_accumulation_steps == 5
    # defaults fill unspecified keys
    assert cfg.optimizer.adam_epsilon == 1e-8


def test_dit_config_for_task():
    assert dit_config_for_task("i2v-14b-720p").dim == 5120
    assert dit_config_for_task("i2v-14b-720p").in_dim == 36
    assert dit_config_for_task("t2v-1.3b").num_layers == 30
    assert WAN_CONFIGS["t2v-14B"]().num_heads == 40
    assert SIZE_CONFIGS["720*1280"] == (720, 1280)


def test_coerce_label():
    assert coerce_label("good") == 1.0
    assert coerce_label("poor") == 0.0
    assert coerce_label(1) == 1.0
    assert coerce_label(0) == 0.0


class TestCheckpointInterop:
    def _params(self, cfg):
        import jax
        from hyvideo_prfl_tpu.models import wan_dit
        return wan_dit.init_params(cfg, jax.random.PRNGKey(0))

    def test_roundtrip_t2v(self):
        import jax
        from hyvideo_prfl_tpu.models import wan_dit
        from hyvideo_prfl_tpu.utils import checkpoint as ck
        cfg = wan_dit.tiny_test(remat=False)
        params = self._params(cfg)
        state = ck.flax_to_torch_state(jax.device_get(params), cfg)
        # reference key-name surface
        assert "blocks.0.self_attn.q.weight" in state
        assert "blocks.1.ffn.2.bias" in state
        assert "head.modulation" in state
        assert "patch_embedding.weight" in state
        assert state["patch_embedding.weight"].shape == (128, 16, 1, 2, 2)
        back = ck.torch_state_to_flax(state, cfg)
        flat1 = jax.tree.leaves(params)
        flat2 = jax.tree.leaves(back)
        assert len(flat1) == len(flat2)
        for a, b in zip(jax.tree.leaves(jax.device_get(params)),
                        jax.tree.leaves(jax.device_get(back))):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_patch_embedding_matches_torch_conv3d(self):
        """The Dense patch embed == torch Conv3d(stride=kernel) on the same
        weights (the layout contract for released checkpoints)."""
        import torch
        import jax
        import jax.numpy as jnp
        from hyvideo_prfl_tpu.models import wan_dit
        from hyvideo_prfl_tpu.utils import checkpoint as ck

        cfg = wan_dit.tiny_test(remat=False)
        params = self._params(cfg)
        state = ck.flax_to_torch_state(jax.device_get(params), cfg)
        w = torch.from_numpy(state["patch_embedding.weight"].copy())
        b = torch.from_numpy(state["patch_embedding.bias"].copy())
        x = np.random.RandomState(0).randn(1, 16, 4, 8, 8).astype(np.float32)
        ref = torch.nn.functional.conv3d(
            torch.from_numpy(x), w, b, stride=(1, 2, 2)
        ).numpy()  # [1, dim, 4, 4, 4]

        # our path: channel-last patchify + Dense kernel
        xl = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # [1,4,8,8,16]
        bsz, f, h, wd, c = xl.shape
        xp = xl.reshape(1, 4, 1, 4, 2, 4, 2, 16)
        xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(1, 64, 1 * 2 * 2 * 16)
        k = params["params"]["patch_embedding"]["kernel"]
        bias = params["params"]["patch_embedding"]["bias"]
        ours = (xp @ k + bias).reshape(1, 4, 4, 4, cfg.dim)
        ref_l = np.transpose(ref, (0, 2, 3, 4, 1))  # to [1,4,4,4,dim]
        np.testing.assert_allclose(np.asarray(ours), ref_l, atol=1e-4)

    def test_safetensors_shard_roundtrip(self, tmp_path):
        import jax
        from hyvideo_prfl_tpu.models import wan_dit
        from hyvideo_prfl_tpu.utils import checkpoint as ck
        cfg = wan_dit.tiny_test(remat=False)
        params = self._params(cfg)
        out = ck.save_wan_checkpoint(params, cfg, str(tmp_path), step=7)
        assert out.endswith("checkpoint-7")
        assert os.path.exists(os.path.join(out, "config.json"))
        assert ck.parse_resume_step(out) == 7
        loaded = ck.load_wan_checkpoint(out, cfg)
        for a, b in zip(jax.tree.leaves(jax.device_get(params)),
                        jax.tree.leaves(jax.device_get(loaded))):
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_checkpoint_key_surface_matches_released_models():
    """Our converter's key surface equals the reference WanModel state_dict
    key set for t2v-14B and i2v-14B (fixtures generated from the reference
    module structure on a meta device — the released
    diffusion_pytorch_model.safetensors.index.json key sets). Key names
    depend only on model STRUCTURE, so tiny dims with the full 40-layer /
    i2v-extras structure exercise the complete surface; the first real
    Wan2.1 weight load then cannot fail on missing/unexpected keys."""
    import jax
    import dataclasses
    from hyvideo_prfl_tpu.models import wan_dit
    from hyvideo_prfl_tpu.utils import checkpoint as ck

    here = os.path.dirname(os.path.abspath(__file__))
    for task, factory in (("t2v_14b", wan_dit.t2v_14b),
                          ("i2v_14b", wan_dit.i2v_14b)):
        with open(os.path.join(here, "fixtures",
                               f"wan_{task}_state_keys.json")) as f:
            ref_keys = set(json.load(f))
        cfg = dataclasses.replace(
            factory(remat=False), dim=64, ffn_dim=128, num_heads=2,
            freq_dim=32, text_dim=16)
        params = wan_dit.init_params(cfg, jax.random.PRNGKey(0))
        state = ck.flax_to_torch_state(jax.device_get(params), cfg)
        ours = set(state.keys())
        assert ours == ref_keys, (
            f"{task}: missing={sorted(ref_keys - ours)[:10]} "
            f"unexpected={sorted(ours - ref_keys)[:10]}")
        # and the importer consumes exactly that set
        back = ck.torch_state_to_flax(state, cfg)
        assert set(back["params"].keys()) == set(params["params"].keys())


def test_multihost_replica_row_selection():
    """Pod data loading: each process owns whole data rows; spanning rows
    are a layout error (scripts/_common._rows_for_process)."""
    import numpy as np
    import pytest

    from scripts._common import _rows_for_process

    # 4 data rows x 2 devices, 2 hosts, data outermost
    procs = np.array([[0, 0], [0, 0], [1, 1], [1, 1]])
    assert _rows_for_process(procs, 0) == [0, 1]
    assert _rows_for_process(procs, 1) == [2, 3]
    # a row spanning hosts must be rejected
    bad = np.array([[0, 1], [0, 1]])
    with pytest.raises(AssertionError):
        _rows_for_process(bad, 0)


def test_batch_iterator_carries_partial_batch_across_epochs():
    """A replica block smaller than batch_size must fill its batch across
    epoch boundaries (never silently spin). Regression: smoke_pavrm_i2v
    (6 samples, 8 data replicas, batch_size 2) hung forever."""
    import numpy as np

    from hyvideo_prfl_tpu.data.loader import DataParallelLoader

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.int64)}

    dl = DataParallelLoader(DS(), num_replicas=8, batch_size=2, prefetch=0)
    batch = next(iter(dl))
    assert batch["x"].shape == (16, 2)  # 8 replicas x bs 2


def test_dataparallel_loader_replica_ranks(tmp_path):
    """replica_ranks restricts the streams to this process's rows while
    keeping the global num_replicas block math."""
    import numpy as np

    from hyvideo_prfl_tpu.data.loader import DataParallelLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.int64)}

    # global replicas 4 (block=2); this "process" owns rows 2 and 3
    dl = DataParallelLoader(DS(), num_replicas=4, batch_size=1,
                            prefetch=0, replica_ranks=[2, 3])
    batch = next(iter(dl))
    # rows 2,3 -> contiguous blocks [4,5] and [6,7]; first index of each
    np.testing.assert_array_equal(batch["x"][:, 0], [4, 6])
