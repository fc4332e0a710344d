"""L2 kernel tests (SURVEY.md §4.2): every kernel against its pure-jnp /
sorted-impl twin, Pallas paths in interpret mode on CPU; adversarial
inputs (duplicates, skew, empties, edge keys)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpq import Table, datagen
from tpq.columnar import canonicalize
from tpq.hashing import hash_keys
from tpq.kernels.radix_partition import partition_padded, radix_histogram
from tpq.kernels.radix_sort import msd_partition, radix_sort_perm, sort_rows
from tpq.kernels.rh_table import plan_rh, rh_hash_join
from tpq.ops import hash_join


def _canon_equal(a, b):
    ca, cb = canonicalize(a), canonicalize(b)
    assert list(ca) == list(cb)
    for k in ca:
        assert np.array_equal(ca[k], cb[k]), k


def test_radix_histogram_matches_bincount():
    rng = np.random.default_rng(0)
    bucket = rng.integers(0, 64, 1 << 14).astype(np.int32)
    # sprinkle sentinel (out-of-range) ids: must be ignored
    bucket[::17] = 64
    h = np.asarray(radix_histogram(jnp.asarray(bucket), 64, tile=2048, interpret=True))
    expected = np.bincount(bucket[bucket < 64], minlength=64)
    assert np.array_equal(h, expected)


def test_partition_padded_stable_and_complete():
    rng = np.random.default_rng(1)
    n = 1 << 12
    bucket = rng.integers(0, 16, n).astype(np.int32)
    rowid2d, valid2d, starts, overflow = partition_padded(jnp.asarray(bucket), 16, 1 << 10)
    assert not bool(overflow)
    rowid2d, valid2d = np.asarray(rowid2d), np.asarray(valid2d)
    seen = []
    for p in range(16):
        rows = rowid2d[p][valid2d[p]]
        assert np.all(bucket[rows] == p)
        assert np.all(np.diff(rows) > 0), "stability: original order preserved"
        seen.append(rows)
    assert len(np.concatenate(seen)) == n


def test_partition_overflow_flag():
    bucket = jnp.zeros(1024, jnp.int32)  # all one bucket
    _, _, _, overflow = partition_padded(bucket, 16, 256)
    assert bool(overflow)


def test_radix_sort_perm_matches_numpy():
    rng = np.random.default_rng(2)
    keys = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, 4096,
                        dtype=np.int64)
    perm = np.asarray(radix_sort_perm(jnp.asarray(keys)))
    assert np.array_equal(keys[perm], np.sort(keys, kind="stable"))


def test_sort_rows_cosorts_all_columns():
    t = Table.from_numpy({"key": np.array([3, 1, 2], dtype=np.int64),
                          "p0": np.array([30, 10, 20], dtype=np.int64)})
    out = sort_rows(t).to_numpy()
    assert out["key"].tolist() == [1, 2, 3]
    assert out["p0"].tolist() == [10, 20, 30]


def test_msd_partition_ranges_are_ordered():
    rng = np.random.default_rng(3)
    keys = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, 4096,
                        dtype=np.int64)
    rowid2d, valid2d, overflow = msd_partition(jnp.asarray(keys), 4096, bits=4,
                                               part_cap=1024)
    assert not bool(overflow)
    rowid2d, valid2d = np.asarray(rowid2d), np.asarray(valid2d)
    prev_max = None
    for p in range(16):
        rows = rowid2d[p][valid2d[p]]
        if len(rows) == 0:
            continue
        if prev_max is not None:
            assert keys[rows].min() >= prev_max
        prev_max = keys[rows].max()


@pytest.mark.parametrize(
    "nr,ns,nk,kind",
    [(2000, 3000, 500, "uniform"), (2048, 2048, 64, "uniform"),
     (3000, 3000, 1000, "zipf"), (0, 64, 10, "uniform")],
)
def test_rh_join_matches_sorted_impl(nr, ns, nk, kind):
    r = datagen.gen_relation_np(nr, nk, payloads=2, seed=11, kind=kind)
    s = datagen.gen_relation_np(ns, nk, payloads=1, seed=22, kind=kind)
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    plan = plan_rh(R.capacity, S.capacity, target_part_rows=512)
    a = rh_hash_join(R, S, 1 << 17, plan=plan, interpret=True)
    b = hash_join(R, S, 1 << 17)
    assert int(a.num_rows) == int(b.num_rows)
    _canon_equal(a, b)


def test_rh_join_edge_keys():
    im, ix = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    r = {"key": np.array([im, ix, ix, 0, -1, 5], dtype=np.int64),
         "p0": np.arange(6, dtype=np.int64)}
    s = {"key": np.array([ix, im, 5, 5, 7, ix, 0], dtype=np.int64),
         "p0": np.arange(7, dtype=np.int64) * 10}
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    a = rh_hash_join(R, S, 1 << 8, interpret=True)
    b = hash_join(R, S, 1 << 8)
    _canon_equal(a, b)


def test_hash_keys_range():
    keys = jnp.asarray(datagen.uniform_keys(1 << 12, 1 << 40, seed=9))
    for bits in (1, 4, 11):
        h = np.asarray(hash_keys(keys, bits))
        assert h.min() >= 0 and h.max() < (1 << bits)
