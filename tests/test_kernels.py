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


@pytest.mark.slow  # 87 s cold; the bits-sequence variant keeps the
# differential coverage in the fast suite
def test_lsd_radix_sort_matches_numpy():
    """C5: the Pallas 1-bit-split LSD sort (interpret mode) against a
    numpy stable sort — duplicates, live-prefix padding, multiple
    carried value planes."""
    from tpq.kernels.radix_sort import lsd_radix_sort

    rng = np.random.default_rng(5)
    n, n_live = 5000, 4321
    keys = rng.integers(0, 1 << 20, size=n).astype(np.int64)
    vals = rng.integers(0, 1 << 31, size=n).astype(np.int32)
    klo = (keys & 0xFFFFFFFF).astype(np.uint32)
    khi = (keys >> 32).astype(np.uint32)

    out = lsd_radix_sort([jnp.asarray(klo), jnp.asarray(khi)],
                         [jnp.asarray(vals)], jnp.int32(n_live), key_bits=20)
    got_keys = (np.asarray(out[0]).astype(np.uint64)
                | (np.asarray(out[1]).astype(np.uint64) << 32)).astype(np.int64)
    got_vals = np.asarray(out[2])

    order = np.argsort(keys[:n_live], kind="stable")
    assert np.array_equal(got_keys[:n_live], keys[:n_live][order])
    assert np.array_equal(got_vals[:n_live], vals[:n_live][order])


def test_lsd_radix_sort_bits_arbitrary_sequence():
    """Composite-key LSD over an arbitrary bit sequence (the merge
    path's (side, key, invalid) ordering uses this form)."""
    from tpq.kernels.radix_sort import lsd_radix_sort_bits

    rng = np.random.default_rng(6)
    n = 3000
    a = rng.integers(0, 8, size=n).astype(np.int32)    # 3 bits
    b = rng.integers(0, 2, size=n).astype(np.int32)    # 1 bit, major
    idx = np.arange(n, dtype=np.int32)
    specs = [(0, 0), (0, 1), (0, 2), (1, 0)]           # a LSD, then b
    out = lsd_radix_sort_bits(
        [jnp.asarray(a), jnp.asarray(b), jnp.asarray(idx)], specs)
    order = np.lexsort((idx, a, b))
    assert np.array_equal(np.asarray(out[0]), a[order])
    assert np.array_equal(np.asarray(out[2]), idx[order])


@pytest.mark.slow  # 322 s cold: compiles BOTH merge engines end-to-end
def test_merge_join_radix_engine_matches_lax():
    """merge_join(sort_engine="radix") — C5 wired into the merge path —
    is row-identical to the lax-sorted engine, negative keys included."""
    from tpq.ops.merge_join import merge_join

    r = datagen.gen_relation_np(800, 200, payloads=1, seed=91)
    s = datagen.gen_relation_np(1200, 200, payloads=1, seed=92)
    r["key"][:50] -= 1 << 40  # negative keys exercise the sign bias
    s["key"][:70] -= 1 << 40
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    a = merge_join(R, S, 1 << 13)
    b = merge_join(R, S, 1 << 13, sort_engine="radix", key_bits=64)
    assert int(a.num_rows) == int(b.num_rows)
    _canon_equal(a, b)


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


def test_hash_keys_range():
    keys = jnp.asarray(datagen.uniform_keys(1 << 12, 1 << 40, seed=9))
    for bits in (1, 4, 11):
        h = np.asarray(hash_keys(keys, bits))
        assert h.min() >= 0 and h.max() < (1 << bits)


@pytest.mark.slow  # 191 s cold: a full lane join + union fallback pair
def test_lane_h2_hazard_falls_back_exact():
    """Two distinct keys colliding on the lane table's full (bucket, h2)
    composite (found by offline search over random u64 keys; plan has
    npart=8 at this capacity so bucket = 10 hash bits; note h2 is
    bijective on keys < 2^32, so colliding pairs must differ in the
    high word) must flip the build hazard flag — the lane path may not
    assume key-contiguity in d — and the operator must still be exact
    via the sorted fallback."""
    from tpq.kernels.lane_table import LanePlan
    from tpq.kernels.lane2 import lane2_path_taken

    # pbits=3 pins bucket = 10 hash bits, the domain the pair was found in
    plan = LanePlan(pbits=3, depth=16, probe_cap=1024, inline_k=4,
                    tail_rows_cap=2048, tail_out_cap=4096)
    k1, k2 = 7302945295039616556, 3449075177175606448  # same (bucket, h2)
    r = {"key": np.array([k1, k2, 5, 6, 7], dtype=np.int64),
         "p0": np.arange(5, dtype=np.int64)}
    s = {"key": np.array([k1, k2, k1, 6], dtype=np.int64),
         "p0": np.arange(4, dtype=np.int64) * 10}
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    assert not bool(lane2_path_taken(R, S, 1 << 8, plan=plan))
    a = hash_join(R, S, 1 << 8, impl="lane")
    b = hash_join(R, S, 1 << 8, impl="sorted")
    assert int(a.num_rows) == int(b.num_rows) == 4
    _canon_equal(a, b)
