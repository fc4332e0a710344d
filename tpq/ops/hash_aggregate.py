"""C8 — hash aggregate: group-by key -> count + per-payload sum
(SURVEY.md §2.1 C8; BASELINE.json:L5,L10 "hash aggregate (group-by
count/sum)"; oracle twin: oracle/main.cc aggregate()).

TPU realization (sort path, always available): co-sort by key, then
compute every per-group statistic AT RUN-END POSITIONS with scans only —
zero gathers, zero scatters (XLA:TPU executes general gather/scatter
near-serially: 16 ms per 1M-row gather, scripts/tpu_phase_bench.py):

  * run starts by neighbor compare; run start index rs by cummax;
  * count at an end position = i - rs + 1;
  * sum over the run = c[i] - B, where c is the inclusive cumsum and B is
    a fill-forward (associative scan) of "cumsum just before my run's
    start" sampled at run starts;
  * one multi-operand stable sort by the is-end flag compacts group rows
    to the front, carrying key/count/sums as 32-bit planes.

Sums are wrapping int64 (associative-safe — no float reorder
nondeterminism, SURVEY.md §4.4.4). Output columns: key, count,
sum_<payload>... in input payload order; groups emitted in ascending key
order (canonical already — the flag sort is stable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpq.columnar import Table
from tpq.ops._expand import barrier
from tpq.ops.merge_join import sort_table_by_key
from tpq.ops.union_join import col_planes, fill_forward, planes_col

I32 = jnp.int32
I64 = jnp.int64


def hash_aggregate(t: Table, key: str = "key") -> Table:
    """Group t by `key`; count + sum every other column. Output capacity =
    input capacity (ngroups <= nrows always)."""
    cap = t.capacity
    ts = sort_table_by_key(t, key)
    k = ts.col(key)
    valid = ts.valid_mask()
    i = jnp.arange(cap, dtype=I32)

    is_start = valid & jnp.concatenate([jnp.ones(1, bool), k[1:] != k[:-1]])
    # a run ends where the next row starts a new run, is padding, or at cap-1
    nxt_new = jnp.concatenate([is_start[1:] | ~valid[1:], jnp.ones(1, bool)])
    is_end = valid & nxt_new
    rs = jax.lax.cummax(jnp.where(is_start, i, -1))  # my run's start index

    # per-column sums at end positions: c[i] - (cumsum just before run start)
    names = [n for n in ts.names if n != key]
    cums = []
    for n in names:
        v = jnp.where(valid, ts.col(n), 0).astype(I64)
        cums.append(jnp.cumsum(v))
    pre_planes: list[jnp.ndarray] = []  # c shifted right by 1, as u32 planes
    for c in cums:
        shifted = jnp.concatenate([jnp.zeros(1, I64), c[:-1]])
        pre_planes += list(col_planes(shifted))
    filled = fill_forward(is_start, pre_planes) if pre_planes else []

    out_cols: dict[str, jnp.ndarray] = {}
    out_cols[key] = jnp.where(is_end, k, 0)
    out_cols["count"] = jnp.where(is_end, (i - rs + 1).astype(I64), 0)
    for j, n in enumerate(names):
        base = planes_col(tuple(filled[2 * j: 2 * j + 2]), I64)
        out_cols[f"sum_{n}"] = jnp.where(is_end, cums[j] - base, 0)

    # compact group rows (at end positions) to the front with the PACK
    # mover (tpq/kernels/move.py) — one linear Pallas pass instead of a
    # full-table flag sort (lax.sort scales superlinearly past ~2M rows,
    # BASELINE.md #19; the 100M-row config-4 aggregate sits here)
    from tpq.kernels.move import pack

    layout: list[tuple[str, int]] = []
    flat: list[jnp.ndarray] = []
    for n, col in out_cols.items():
        ps = col_planes(col)
        layout.append((n, len(ps)))
        flat += list(ps)
    packed, n_groups = pack([p.astype(I32) for p in flat],
                            is_end.astype(I32))
    cols, pos = {}, 0
    for n, cnt in layout:
        cols[n] = planes_col(tuple(packed[pos + j].astype(jnp.uint32)
                                   for j in range(cnt)),
                             out_cols[n].dtype)
        pos += cnt
    return Table(cols, n_groups.astype(I32))
