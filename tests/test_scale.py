"""Scale-proportional correctness (SURVEY.md §4.4.4; VERDICT r1 item 8):
a 10M-row oracle-exact join (slow marker) and the key-range-slice +
multiset-checksum verifier that stands in for the oracle at sizes it
cannot reach."""

import numpy as np
import pytest

from tpq import Table, colio, datagen
from tpq.columnar import canonicalize
from tpq.ops import hash_join
from tpq.verify import (
    multiset_checksum,
    multiset_checksum_np,
    sample_key_ranges,
    slice_by_key,
)

from conftest import assert_tables_equal


@pytest.mark.slow
def test_join_10m_matches_oracle(oracle, tmp_path):
    """SURVEY §4.4.4: oracle runs 10M rows in seconds — prove exactness at
    a realistic scale, not just 8k-row unit sizes."""
    n = 10_000_000
    r = datagen.gen_relation_np(n, n, payloads=1, seed=101)
    s = datagen.gen_relation_np(n, n, payloads=1, seed=102)
    pr, ps, po = (tmp_path / f"s10m_{x}.tpqc" for x in ("r", "s", "o"))
    colio.dump(str(pr), r)
    colio.dump(str(ps), s)
    oracle("join", algo="hash", left=pr, right=ps, out=po)
    expected = colio.load(str(po))

    out = hash_join(Table.from_numpy(r), Table.from_numpy(s), 1 << 25)
    assert int(out.num_rows) == len(expected["key"])
    assert_tables_equal(canonicalize(out), expected, "scale_10m")


@pytest.mark.slow  # 575 s cold (200k-row join + per-window slices); the
# checksum test keeps the scale-verification contract in the fast suite
def test_key_range_slicing_verifies_join(oracle, tmp_path):
    """The sampled-slice contract: restricting inputs and output to a key
    window commutes with the join, so the oracle verifies windows of a
    join it could never run whole."""
    n = 200_000
    r = datagen.gen_relation_np(n, n, payloads=1, seed=201)
    s = datagen.gen_relation_np(n, n, payloads=1, seed=202)
    out = hash_join(Table.from_numpy(r), Table.from_numpy(s), 1 << 19)
    got = canonicalize(out)
    nr = int(out.num_rows)
    got = {k: np.asarray(v)[:nr] for k, v in got.items()}

    for i, (lo, hi) in enumerate(sample_key_ranges(r["key"], n_ranges=3,
                                                   target_rows=1024, seed=7)):
        rs, ss = slice_by_key(r, lo, hi), slice_by_key(s, lo, hi)
        pr, ps, po = (tmp_path / f"w{i}_{x}.tpqc" for x in ("r", "s", "o"))
        colio.dump(str(pr), rs)
        colio.dump(str(ps), ss)
        oracle("join", algo="hash", left=pr, right=ps, out=po)
        expected = colio.load(str(po))
        got_w = _canon(slice_by_key(got, lo, hi))
        assert_tables_equal(got_w, expected, f"window{i}[{lo},{hi})")


def _canon(cols):
    names = list(cols.keys())
    order = np.lexsort(tuple(cols[n] for n in reversed(names)))
    return {n: cols[n][order] for n in names}


def test_multiset_checksum_order_invariant_and_exact():
    rng = np.random.default_rng(5)
    cols = {"key": rng.integers(0, 1 << 40, 5000).astype(np.int64),
            "r_p0": rng.integers(0, 1 << 30, 5000).astype(np.int64)}
    t = Table.from_numpy(cols)
    c_dev = int(multiset_checksum(t))
    c_np = multiset_checksum_np(cols)
    assert c_dev == c_np
    # permuting rows must not change it; flipping one bit must
    perm = rng.permutation(5000)
    assert multiset_checksum_np({k: v[perm] for k, v in cols.items()}) == c_np
    cols2 = dict(cols)
    cols2["key"] = cols["key"].copy()
    cols2["key"][17] ^= 1
    assert multiset_checksum_np(cols2) != c_np


def test_checksum_engine_vs_oracle_join(oracle, tmp_path):
    """Engine join output and oracle join output have equal multiset
    checksums (they are the same multiset) — the cheap global check used
    when byte comparison is too large to materialize."""
    r = datagen.gen_relation_np(3000, 1000, payloads=1, seed=301)
    s = datagen.gen_relation_np(4000, 1000, payloads=1, seed=302)
    pr, ps, po = (tmp_path / f"ck_{x}.tpqc" for x in ("r", "s", "o"))
    colio.dump(str(pr), r)
    colio.dump(str(ps), s)
    oracle("join", algo="hash", left=pr, right=ps, out=po)
    expected = colio.load(str(po))

    out = hash_join(Table.from_numpy(r), Table.from_numpy(s), 1 << 16)
    assert int(multiset_checksum(out)) == multiset_checksum_np(expected)
