"""C6 — hash equi-join (SURVEY.md §2.1 C6; BASELINE.json:L5 "hash join
(build+probe with open-addressing/robin-hood tables)"; oracle twin:
oracle/main.cc hash_join()).

The TPU design replaces the reference's per-tuple probe loop with two
implementations behind one operator:

  * impl="sorted" (this module, always available): hash-ordered layout.
    Build side is sorted by the composite (hash slot << 32 | secondary
    32-bit hash) — exactly the robin-hood table's content order (a
    robin-hood table IS its entries sorted by home slot; SURVEY.md §7.4.1)
    — probes binary-search that layout, candidates are verified by true
    key equality and compacted (secondary-hash collisions are resolved
    exactly, never assumed away).

  * impl="rh" (tpq/kernels/rh_table.py): radix-partitioned VMEM-resident
    robin-hood build + streaming probe Pallas kernels — the speed-of-light
    path (wired in at milestone M3).

Semantics (both impls, oracle-exact): inner join on `key`; duplicate keys
on both sides yield the full per-key cross product; output columns
key, r_<R payloads...>, s_<S payloads...>; static out_capacity with
overflow visible as num_rows > capacity.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpq.columnar import Table
from tpq.hashing import hash_keys
from tpq.ops._expand import barrier, expand_segments, searchsorted
from tpq.ops.filter import compact

I64_MAX = jnp.iinfo(jnp.int64).max
_SALT_SLOT = 0x5EED0001
_SALT_VERIFY = 0x5EED0002


def _composite(keys: jnp.ndarray, valid: jnp.ndarray, bits: int) -> jnp.ndarray:
    """(slot, h2) packed into a sortable non-negative int64; padding rows
    get I64_MAX so they order last."""
    slot = hash_keys(keys, bits, salt=_SALT_SLOT).astype(jnp.int64)
    h2 = hash_keys(keys, 32, salt=_SALT_VERIFY).astype(jnp.int64) & 0xFFFFFFFF
    comp = (slot << 32) | h2
    return jnp.where(valid, comp, I64_MAX)


def hash_join(
    r: Table,
    s: Table,
    out_capacity: int,
    key: str = "key",
    bits: int | None = None,
    impl: str = "lane",
) -> Table:
    """Inner equi-join R ⋈ S on `key`.

    impl="lane" (default): the compiled lane-bucket table path
    (tpq/kernels/lane_table.py) — partitioned VMEM-resident hash tables
    probed with a D-round in-register walk; falls back to the sorted
    impl under lax.cond on any static-capacity violation (high skew).
    impl="sorted": the union-sort engine (also merge_join's engine).
    impl="rh": the round-1 sorted-placement robin-hood prototype
    (interpret-mode only on TPU; kept for differential tests).
    """
    if impl == "lane":
        from tpq.kernels.lane_table import lane_hash_join

        return lane_hash_join(r, s, out_capacity, key=key)
    if impl == "rh":
        from tpq.kernels.rh_table import rh_hash_join

        return rh_hash_join(r, s, out_capacity, key=key)
    if impl != "sorted":
        raise ValueError(f"unknown impl {impl!r}")

    from tpq.ops.union_join import union_join

    return union_join(r, s, out_capacity, key=key)


def _legacy_sorted_hash_join(r, s, out_capacity, key="key", bits=None):
    """Pre-union-sort implementation (searchsorted + gathers). Kept as a
    differential-test twin; ~50x slower on TPU (gather-bound, see
    tpq/ops/union_join.py module docstring)."""
    if bits is None:
        bits = max(1, min(30, (r.capacity - 1).bit_length()))

    comp_r = barrier(_composite(r.col(key), r.valid_mask(), bits))
    order = barrier(jnp.argsort(comp_r, stable=True))
    comp_sorted = comp_r[order]
    r_sorted = Table(barrier(dict(r.gather(order, r.num_rows).columns)), r.num_rows)

    comp_s = barrier(_composite(s.col(key), s.valid_mask(), bits))
    lower = searchsorted(comp_sorted, comp_s, side="left").astype(jnp.int32)
    upper = searchsorted(comp_sorted, comp_s, side="right").astype(jnp.int32)
    lower = barrier(jnp.minimum(lower, r.num_rows))
    upper = barrier(jnp.minimum(upper, r.num_rows))
    counts = jnp.where(s.valid_mask(), upper - lower, 0)

    seg, rank, total, valid = expand_segments(counts, out_capacity)
    r_idx = jnp.minimum(lower[seg] + rank, r.capacity - 1)
    s_idx = seg

    rk = r_sorted.col(key)[r_idx]
    sk = s.col(key)[s_idx]
    true_match = valid & (rk == sk)

    cols = {key: jnp.where(valid, sk, 0)}
    for name, col in r_sorted.columns.items():
        if name != key:
            cols[f"r_{name}"] = jnp.where(valid, col[r_idx], 0)
    for name, col in s.columns.items():
        if name != key:
            cols[f"s_{name}"] = jnp.where(valid, col[s_idx], 0)
    candidates = Table(barrier(cols), jnp.minimum(total, out_capacity))
    out = compact(candidates, true_match)
    # Preserve overflow visibility: if candidates exceeded out_capacity we
    # cannot have produced the exact match set — surface total (> capacity)
    # as num_rows so callers detect it and renegotiate (SURVEY.md §5.3).
    return Table(out.columns, jnp.where(total <= out_capacity, out.num_rows, total))
