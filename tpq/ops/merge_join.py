"""C7 — sort-merge equi-join (SURVEY.md §2.1 C7).

Reference capability: sort-merge join with radix-sorted runs + two-cursor
merge (BASELINE.json:L5 "radix sort for the merge path"; oracle twin:
oracle/main.cc merge_join). A cursor merge is serial control flow — the
TPU realization instead:

  1. co-sort the build side R by key (radix sort kernel C5; `jax.lax`
     stable argsort as the always-correct fallback, SURVEY.md §7.3.4);
  2. for every probe row of S, binary-search the sorted R keys for its
     match range [lower, upper) — vectorized over all rows at once;
  3. expand (offset, count) segments into gather indices with
     cumsum + scatter + cummax (tpq/ops/_expand.py) — no per-row loops.

Join semantics match the oracle exactly: inner equi-join on "key",
duplicates produce the full cross product per key; output columns
key, r_<R payloads>, s_<S payloads>.

Output capacity is static (worst case |R|x|S| is unrepresentable —
SURVEY.md §7.4.3): callers pass out_capacity; `num_rows` returned may
exceed it, which callers must treat as overflow and renegotiate.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpq.columnar import Table
from tpq.ops._expand import barrier, expand_segments, searchsorted

I64_MAX = jnp.iinfo(jnp.int64).max


def sort_table_by_key(t: Table, key: str = "key") -> Table:
    """Stable co-sort of all columns by `key`; padding rows sort last.

    ONE multi-operand stable sort with (invalid, key) as sort keys and all
    other columns carried as 32-bit planes — the sort applies the
    permutation to the data; no argsort+gather (gathers cost 16 ms/M on
    TPU, scripts/tpu_phase_bench.py). No sentinel keys: padding is ordered
    by the explicit invalid plane, so I64_MAX is an ordinary key value."""
    import jax

    from tpq.ops.union_join import col_planes, planes_col

    inv = barrier((~t.valid_mask()).astype(jnp.int32))
    names = [n for n in t.names if n != key]
    layout: list[tuple[str, int]] = []
    flat: list[jnp.ndarray] = []
    for name in names:
        ps = col_planes(t.col(name))
        layout.append((name, len(ps)))
        flat += list(ps)
    res = jax.lax.sort((inv, t.col(key), *flat), num_keys=2, is_stable=True)
    cols, pos = {key: res[1]}, 2
    for name, cnt in layout:
        cols[name] = planes_col(tuple(res[pos + j] for j in range(cnt)),
                                t.col(name).dtype)
        pos += cnt
    return Table(cols, t.num_rows)


def merge_join(r: Table, s: Table, out_capacity: int, key: str = "key",
               sort_engine: str = "lax", key_bits: int = 64) -> Table:
    """Inner equi-join R ⋈ S on `key`. Returns Table with static capacity
    `out_capacity`; .num_rows is the true match count (check overflow).

    Realized by the union-sort engine (tpq/ops/union_join.py): the union
    sort IS the merge (both relations co-sorted by key), emission is
    scan-based. sort_engine="radix" runs the sort on C5's Pallas LSD
    radix kernel (tpq/kernels/radix_sort.py) — the genuinely distinct
    radix-sorted merge path of BASELINE.json:L5, with `key_bits`
    narrowing the pass count when the key domain is bounded;
    sort_engine="lax" (default) uses the one-shot multi-operand
    `lax.sort`, which measures faster per call at benchmark shapes on
    v5e but compiles pathologically (see radix_sort.py docstring for
    the measured comparison). This module keeps the legacy searchsorted
    variant below as a differential-test twin."""
    from tpq.ops.union_join import union_join

    return union_join(r, s, out_capacity, key=key,
                      sort_engine=sort_engine, key_bits=key_bits)


def _legacy_merge_join(r: Table, s: Table, out_capacity: int, key: str = "key") -> Table:
    """Pre-union-sort implementation (searchsorted + gathers)."""
    n_r, n_s = r.num_rows, s.num_rows
    r_sorted = sort_table_by_key(r, key)
    # searchsorted needs a globally sorted array: padding rows (now carrying
    # their original keys, ordered after valid rows) are forced to I64_MAX.
    rk = jnp.where(jnp.arange(r_sorted.capacity) < n_r,
                   r_sorted.col(key), I64_MAX)

    sk = s.col(key)
    lower = searchsorted(rk, sk, side="left").astype(jnp.int32)
    upper = searchsorted(rk, sk, side="right").astype(jnp.int32)
    # Padding R rows sit at positions >= n_r with key I64_MAX: clamp the
    # range so real probes of I64_MAX don't match padding.
    lower = barrier(jnp.minimum(lower, n_r))
    upper = barrier(jnp.minimum(upper, n_r))
    counts = jnp.where(s.valid_mask(), upper - lower, 0)

    seg, rank, total, valid = expand_segments(counts, out_capacity)
    r_idx = jnp.minimum(lower[seg] + rank, r_sorted.capacity - 1)
    s_idx = seg

    cols = {key: jnp.where(valid, sk[s_idx], 0)}
    for name, col in r_sorted.columns.items():
        if name != key:
            cols[f"r_{name}"] = jnp.where(valid, col[r_idx], 0)
    for name, col in s.columns.items():
        if name != key:
            cols[f"s_{name}"] = jnp.where(valid, col[s_idx], 0)
    return Table(cols, total)
