"""TPU smoke suite (SURVEY.md §4.5): 1/1000-scale configs on the real
chip — compile + numerics only. Run with TPQ_TEST_PLATFORM=axon; skipped
on the CPU default. One long-lived process; the persistent compilation
cache (tpq/__init__) keeps reruns warm."""

import numpy as np
import pytest
import jax

from tpq import Table, datagen, colio
from tpq.columnar import canonicalize
from tpq.ops import filter_table, hash_aggregate, hash_join, merge_join
from tpq.query import jit_pipeline

from conftest import assert_tables_equal

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def relations():
    r = datagen.gen_relation_np(1024, 1024, payloads=1, seed=1)
    s = datagen.gen_relation_np(2048, 1024, payloads=2, seed=2)
    return r, s


def _oracle_join(oracle, tmp_path, r, s, algo="hash"):
    pr, ps, po = (tmp_path / f"{n}.tpqc" for n in ("r", "s", "o"))
    colio.dump(str(pr), r)
    colio.dump(str(ps), s)
    oracle("join", algo=algo, left=pr, right=ps, out=po)
    return colio.load(str(po))


@pytest.mark.parametrize("impl,algo", [("sorted", "hash"), ("rh", "hash"), (None, "merge")])
def test_join_on_tpu(oracle, tmp_path, relations, impl, algo):
    r, s = relations
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    expected = _oracle_join(oracle, tmp_path, r, s)
    if algo == "merge":
        out = jax.jit(lambda a, b: merge_join(a, b, 1 << 13))(R, S)
    else:
        out = jax.jit(lambda a, b: hash_join(a, b, 1 << 13, impl=impl))(R, S)
    assert_tables_equal(canonicalize(out), expected, f"tpu_{impl}_{algo}")


def test_aggregate_filter_pipeline_on_tpu(oracle, tmp_path, relations):
    r, s = relations
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    out = jax.jit(lambda t: hash_aggregate(t))(S)
    pin = tmp_path / "agg_in.tpqc"
    po = tmp_path / "agg_out.tpqc"
    colio.dump(str(pin), s)
    oracle("aggregate", **{"in": pin, "out": po})
    assert_tables_equal(canonicalize(out), colio.load(str(po)), "tpu_agg")

    fo = jax.jit(lambda t: filter_table(t, "key", "lt", 512))(S)
    assert int(fo.num_rows) == int((s["key"] < 512).sum())

    pipe = jit_pipeline(1 << 13)
    res = pipe(R, S, 512)
    assert int(res.num_rows) > 0


def test_determinism_on_tpu(relations):
    r, s = relations
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    f = jax.jit(lambda a, b: hash_join(a, b, 1 << 13))
    a, b = f(R, S), f(R, S)
    for k in a.columns:
        assert np.array_equal(np.asarray(a.columns[k]), np.asarray(b.columns[k]))
