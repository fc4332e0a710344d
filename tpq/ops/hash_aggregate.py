"""C8 — hash aggregate: group-by key -> count + per-payload sum
(SURVEY.md §2.1 C8; BASELINE.json:L5,L10 "hash aggregate (group-by
count/sum)"; oracle twin: oracle/main.cc aggregate()).

Two paths:
  * sort path (this module, always available): co-sort by key, segment ids
    from neighbor compare, `jax.ops.segment_sum` — the "sort-based
    fallback" of SURVEY.md §2.1 C8;
  * table path (tpq/kernels/rh_table.py accumulate-on-hit) arrives with
    the hash-join kernel layer and reuses this as its test reference.

Sums are wrapping int64 (associative-safe — no float reorder
nondeterminism, SURVEY.md §4.4.4). Output columns: key, count,
sum_<payload>... in input payload order; groups emitted in ascending key
order (canonical already).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpq.columnar import Table
from tpq.ops.filter import compact
from tpq.ops.merge_join import sort_table_by_key

I64_MIN = jnp.iinfo(jnp.int64).min


def hash_aggregate(t: Table, key: str = "key") -> Table:
    """Group t by `key`; count + sum every other column. Output capacity =
    input capacity (ngroups <= nrows always)."""
    cap = t.capacity
    ts = sort_table_by_key(t, key)
    k = ts.col(key)
    valid = ts.valid_mask()

    prev_differs = jnp.concatenate([jnp.zeros(1, jnp.int32), (k[1:] != k[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(prev_differs)  # padding rows (key=I64_MAX) share the last segment
    ones = valid.astype(jnp.int64)

    counts = jax.ops.segment_sum(ones, seg, num_segments=cap)
    keys_g = jax.ops.segment_max(jnp.where(valid, k, I64_MIN), seg, num_segments=cap)

    cols = {key: keys_g, "count": counts}
    for name, col in ts.columns.items():
        if name != key:
            cols[f"sum_{name}"] = jax.ops.segment_sum(jnp.where(valid, col, 0), seg, num_segments=cap)

    # Padding-only segments (and unused segment slots) have count 0: drop.
    grouped = Table(cols, cap)
    return compact(grouped, counts > 0)
