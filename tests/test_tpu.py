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


@pytest.mark.parametrize("impl,algo", [("sorted", "hash"),
                                       ("lane", "hash"), (None, "merge")])
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


def test_lane_path_taken_on_tpu(relations):
    """The compiled lane path must actually run (ok=True) on uniform keys
    at smoke scale — guards the round-2 silent-fallback failure mode on
    the real chip."""
    from tpq.kernels.lane2 import lane2_path_taken as lane_path_taken

    r, s = relations
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    assert bool(jax.jit(lambda a, b: lane_path_taken(a, b, 1 << 13))(R, S))


def test_ragged_all_to_all_degenerate_on_tpu(relations):
    """Executes the ragged_all_to_all rung (BASELINE.json L5) for real:
    XLA:CPU has no ThunkEmitter for it (tests/test_dist.py skip), so the
    1-device degenerate exchange on the chip is the rung's only
    executable coverage until a real slice is attached."""
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tpq.dist import make_mesh
    from tpq.dist.exchange import exchange
    from tpq.dist.mesh import AXIS, owner_of

    mesh = make_mesh(1)
    r, _ = relations
    T = Table.from_numpy(r)

    @partial(shard_map, mesh=mesh,
             in_specs=({k: P(AXIS) for k in T.names}, P()),
             out_specs=({k: P(AXIS) for k in T.names}, P(AXIS), P(AXIS)))
    def body(cols, n):
        t = Table(cols, n)
        recv, ovf = exchange(t, owner_of(t.col("key"), 1), AXIS, 1,
                             t.capacity, impl="ragged")
        return dict(recv.columns), recv.num_rows[None].astype(np.int32), ovf[None]

    cols, nrows, ovf = body(T.columns, T.num_rows)
    assert int(np.asarray(ovf)[0]) == 0
    assert int(np.asarray(nrows)[0]) == len(r["key"])
    got = np.sort(np.asarray(cols["key"])[:int(nrows[0])])
    assert np.array_equal(got, np.sort(r["key"]))


def test_determinism_on_tpu(relations):
    r, s = relations
    R, S = Table.from_numpy(r), Table.from_numpy(s)
    f = jax.jit(lambda a, b: hash_join(a, b, 1 << 13))
    a, b = f(R, S), f(R, S)
    for k in a.columns:
        assert np.array_equal(np.asarray(a.columns[k]), np.asarray(b.columns[k]))
