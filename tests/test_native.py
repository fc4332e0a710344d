"""Native host data plane (native/tpqio.cc via ctypes) — bitstream parity
with the numpy implementation (the shared contract of SURVEY.md §4.4.3)."""

import numpy as np
import pytest

from tpq import datagen, native


pytestmark = pytest.mark.skipif(not native.available(), reason="no g++ / build failed")


def test_native_uniform_matches_numpy():
    a = native.gen_uniform(100_000, 12345, 42)
    idx = np.arange(100_000, dtype=np.uint64)
    b = (datagen._stream(42, idx) % np.uint64(12345)).astype(np.int64)
    assert np.array_equal(a, b)


def test_native_zipf_matches_numpy():
    a = native.gen_zipf(50_000, 3000, 1.0, 7)
    b = datagen.zipf_keys(50_000, 3000, 1.0, 7)
    assert np.array_equal(a, b)


def test_native_payload_matches_numpy():
    a = native.gen_payload(50_000, 3, 1, 9)
    cols = datagen.payload_cols(50_000, 3, 9)
    assert np.array_equal(a, cols["p1"])


def test_native_path_used_above_threshold(monkeypatch):
    """gen_relation_np at >= threshold rows must produce the identical
    bitstream through the native path (same contract, more threads)."""
    monkeypatch.setattr(datagen, "_NATIVE_THRESHOLD", 1024)
    a = datagen.gen_relation_np(4096, 512, payloads=2, seed=5)
    monkeypatch.setattr(datagen, "_NATIVE_THRESHOLD", 1 << 62)
    b = datagen.gen_relation_np(4096, 512, payloads=2, seed=5)
    for k in a:
        assert np.array_equal(a[k], b[k]), k


def test_native_lexsort_matches_numpy():
    rng = np.random.default_rng(0)
    cols = [rng.integers(0, 50, 10_000).astype(np.int64) for _ in range(3)]
    perm = native.lexsort_rows(cols)
    expected = np.lexsort(tuple(reversed(cols)))
    # permutations may differ on ties; compare row content
    for c in cols:
        assert np.array_equal(c[perm], c[expected])
