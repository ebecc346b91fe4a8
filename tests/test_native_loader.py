"""Native C++ latent loader: build, correctness vs numpy, ordering, errors."""

import numpy as np
import pytest

from hyvideo_prfl_tpu.data.native_loader import (
    NativePrefetcher, build_native,
)


@pytest.fixture(scope="module")
def built():
    if not build_native():
        pytest.skip("no C++ toolchain available")
    return True


@pytest.fixture()
def npy_files(tmp_path):
    rng = np.random.RandomState(0)
    arrays = [
        rng.randn(1, 16, 3, 8, 8).astype(np.float32),
        rng.randn(20, 4096).astype(np.float32),
        (rng.rand(7,) * 100).astype(np.int64),
        rng.randn(5, 5).astype(np.float64),
        rng.randn(2, 3, 4).astype(np.float16),
    ]
    paths = []
    for i, a in enumerate(arrays):
        p = tmp_path / f"a{i}.npy"
        np.save(p, a)
        paths.append(str(p))
    return paths, arrays


def test_native_matches_numpy_in_order(built, npy_files):
    paths, arrays = npy_files
    pf = NativePrefetcher(paths, slots=3, threads=2)
    assert NativePrefetcher.available()
    out = list(pf)
    assert len(out) == len(arrays)
    for got, want in zip(out, arrays):
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, want)
    pf.close()


def test_native_many_files_stress(built, tmp_path):
    rng = np.random.RandomState(1)
    paths, sums = [], []
    for i in range(40):
        a = rng.randn(32, 64).astype(np.float32)
        p = tmp_path / f"s{i}.npy"
        np.save(p, a)
        paths.append(str(p))
        sums.append(float(a.sum()))
    pf = NativePrefetcher(paths, slots=4, threads=4)
    got = [float(a.sum()) for a in pf]
    np.testing.assert_allclose(got, sums, rtol=1e-6)
    pf.close()


def test_native_missing_file_raises(built, tmp_path):
    a = np.zeros((2, 2), np.float32)
    p = tmp_path / "ok.npy"
    np.save(p, a)
    pf = NativePrefetcher([str(p), str(tmp_path / "missing.npy")])
    it = iter(pf)
    np.testing.assert_array_equal(next(it), a)
    with pytest.raises(IOError):
        next(it)
    pf.close()


def test_fallback_without_library(npy_files, monkeypatch):
    paths, arrays = npy_files
    import hyvideo_prfl_tpu.data.native_loader as nl
    monkeypatch.setattr(nl, "_LIB", None)
    monkeypatch.setattr(nl, "_LIB_TRIED", True)
    pf = nl.NativePrefetcher(paths)
    out = list(pf)
    for got, want in zip(out, arrays):
        np.testing.assert_array_equal(got, want)


def test_stream_read_many(built, npy_files):
    from hyvideo_prfl_tpu.data.native_loader import NativeStream

    paths, arrays = npy_files
    st = NativeStream(slots=4, threads=2)
    assert st.available()
    # two consecutive read_many calls over one stream (ordering state reuse)
    for _ in range(2):
        out = st.read_many(paths)
        for got, want in zip(out, arrays):
            assert got.dtype == want.dtype
            np.testing.assert_array_equal(got, want)
    st.close()


def test_stream_error_then_recover(built, npy_files, tmp_path):
    """A bad path raises, the ring drains fully, and the NEXT read_many
    still returns correct results (no ticket desync)."""
    from hyvideo_prfl_tpu.data.native_loader import NativeStream

    paths, arrays = npy_files
    st = NativeStream(slots=4, threads=2)
    with pytest.raises(IOError):
        st.read_many([paths[0], str(tmp_path / "nope.npy"), paths[1]])
    out = st.read_many(paths)
    for got, want in zip(out, arrays):
        np.testing.assert_array_equal(got, want)
    st.close()


def test_dataset_uses_native_stream(built, tmp_path):
    """LatentCacheDataset routes multi-file samples through read_many."""
    import json

    from hyvideo_prfl_tpu.data.dataset import LatentCacheDataset

    rng = np.random.RandomState(2)
    lat = rng.randn(1, 16, 3, 8, 8).astype(np.float32)
    txt = rng.randn(1, 20, 64).astype(np.float32)
    np.save(tmp_path / "lat.npy", lat)
    np.save(tmp_path / "txt.npy", txt)
    null_dir = tmp_path / "null" / "wanx"
    null_dir.mkdir(parents=True)
    np.save(null_dir / "null.npy", txt)
    np.save(null_dir / "uncond.npy", txt)
    meta = {"vae_latent_path": str(tmp_path / "lat.npy"),
            "text_en_path": str(tmp_path / "txt.npy"),
            "prompt": "x"}
    (tmp_path / "m.json").write_text(json.dumps(meta))
    (tmp_path / "metas.txt").write_text(str(tmp_path / "m.json") + "\n")
    ds = LatentCacheDataset(
        "refl", meta_file_list=[str(tmp_path / "metas.txt")],
        text_len=32, is_i2v=False, null_dir=str(tmp_path / "null"), seed=0)
    assert ds._stream.available()
    s = ds[0]
    np.testing.assert_allclose(
        s["latents"], np.transpose(lat[0], (1, 2, 3, 0)))
    np.testing.assert_array_equal(s["text"][:20], txt[0])
    assert (s["text"][20:] == 0).all()


def test_stream_throughput_vs_numpy(built, tmp_path):
    """Measured host-side speedup of the native parallel path (recorded in
    STATUS.md); asserts it is at least not slower."""
    import time

    from hyvideo_prfl_tpu.data.native_loader import NativeStream

    rng = np.random.RandomState(3)
    paths = []
    for i in range(8):
        a = rng.randn(4, 16, 64, 64).astype(np.float32)  # ~1 MB each
        p = tmp_path / f"t{i}.npy"
        np.save(p, a)
        paths.append(str(p))

    # best-of-3 on both sides: wall-clock assertions are otherwise flaky
    # when the machine is saturated (the worker pool competes for cores)
    t_np = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            ref = [np.load(p) for p in paths]
        t_np = min(t_np, time.perf_counter() - t0)

    st = NativeStream(slots=16, threads=4)
    st.read_many(paths)  # warm page cache symmetric with numpy loop above
    t_native = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = st.read_many(paths)
        t_native = min(t_native, time.perf_counter() - t0)
    st.close()
    for got, want in zip(out, ref):
        np.testing.assert_array_equal(got, want)
    print(f"native {t_native:.4f}s vs numpy {t_np:.4f}s "
          f"({t_np / t_native:.2f}x)")
    # regression-only bound: under a saturated machine the worker pool's
    # 50 ms cv-wait granularity can lose to sequential numpy; the
    # correctness equality above is the hard check, the timing only guards
    # against pathological slowdowns (deadlock, per-read re-open)
    assert t_native < t_np * 3.0
