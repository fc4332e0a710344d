"""C8 — hash aggregate: group-by key -> count + per-payload sum
(SURVEY.md §2.1 C8; BASELINE.json:L5,L10 "hash aggregate (group-by
count/sum)"; oracle twin: oracle/main.cc aggregate()).

TPU realization (sort path, always available): co-sort by key, then
segment sums as *cumsum differences at group boundaries* — cumsum, two
gathers, zero scatters (XLA:TPU executes general scatter/segment_sum
serially; measured in scripts/tpu_smoke.py). The robin-hood
accumulate-on-hit table path (tpq/kernels/rh_table.py) reuses this as its
differential-test reference.

Sums are wrapping int64 (associative-safe — no float reorder
nondeterminism, SURVEY.md §4.4.4). Output columns: key, count,
sum_<payload>... in input payload order; groups emitted in ascending key
order (canonical already).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpq.columnar import Table
from tpq.ops.filter import compact_indices
from tpq.ops.merge_join import sort_table_by_key


def hash_aggregate(t: Table, key: str = "key") -> Table:
    """Group t by `key`; count + sum every other column. Output capacity =
    input capacity (ngroups <= nrows always)."""
    cap = t.capacity
    ts = sort_table_by_key(t, key)
    k = ts.col(key)
    valid = ts.valid_mask()
    n = t.num_rows

    from tpq.ops._expand import barrier

    is_start = valid & jnp.concatenate(
        [jnp.ones(1, bool), k[1:] != k[:-1]]
    )
    # stable front-compaction of group-start positions
    perm, n_groups = compact_indices(barrier(is_start))
    starts = perm  # starts[g] = row index of group g's first row, for g < n_groups
    g_idx = jnp.arange(cap, dtype=jnp.int32)
    is_real = g_idx < n_groups
    # group g spans [starts[g], ends[g]] inclusive; last group ends at n-1
    next_start = jnp.where(g_idx + 1 < n_groups, starts[jnp.minimum(g_idx + 1, cap - 1)], n)
    ends = jnp.maximum(next_start - 1, 0)
    starts_c = jnp.minimum(starts, cap - 1)

    cols = {key: jnp.where(is_real, k[starts_c], 0)}
    ones_cum = jnp.cumsum(valid.astype(jnp.int64))
    # inclusive-cumsum segment sum over [s, e]: c[e] - c[s] + v[s]
    cols["count"] = jnp.where(is_real, ones_cum[ends] - ones_cum[starts_c] + 1, 0)
    for name, col in ts.columns.items():
        if name != key:
            v = jnp.where(valid, col, 0)
            c = jnp.cumsum(v)
            cols[f"sum_{name}"] = jnp.where(is_real, c[ends] - c[starts_c] + v[starts_c], 0)
    return Table(cols, n_groups)
