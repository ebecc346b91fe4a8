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
