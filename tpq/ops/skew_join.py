"""Single-chip heavy-hitter split join (SURVEY.md §2.2 D4's single-chip
face; BASELINE.json:L9 "heavy-hitter splitting + sort-merge fallback for
high-skew keys"; VERDICT r3 item 5).

The lane join's static caps (probe partition capacity, tail) are sized
for near-uniform keys; a zipf probe side concentrates up to ~7% of all
rows on one key, overflowing its partition and (in rounds 2-3) routing
the WHOLE join through the 104 ms union-sort fallback. This operator
splits the key set instead:

  1. NOMINATE — stride-sample the probe keys, sort the sample (tiny),
     run-length count, keep keys whose sample count clears a threshold:
     an exact LIST of candidate heavy keys (<= heavy_cap). Sampling
     noise is harmless in both directions: a missed moderately-heavy key
     stays on the light path (its count is far below the partition
     slack); a false positive rides the mini table at zero extra cost.
  2. MEMBERSHIP — build a single-partition (broadcast) lane table of the
     LIST keys and probe BOTH relations against it (cnt-only walks, no
     grouping sort — the npart==1 identity layout): heavy row masks.
  3. HEAVY PATH — compact R's heavy rows into a small table (<= mini_cap
     rows), build a broadcast lane table with a deep inline budget
     (inline_k=8 — a heavy probe key whose build multiplicity exceeds
     the inline budget would otherwise dump its entire row mass into the
     tail), and probe the FULL S against it: emits exactly the matches
     whose key is in the list.
  4. LIGHT PATH — the ordinary partitioned lane join over
     compact(R, ~heavy) x compact(S, ~heavy): near-uniform by
     construction, takes the compiled path.
  5. SPLICE — heavy output rows are placed directly after the light
     rows with one dynamic_update_slice per plane (the windowed splice
     trick of lane_table.py's tail).

Any static violation (list overflow, mini-table overflow, lane caps,
splice window) routes the whole join through the union-sort engine via
lax.cond — correctness never depends on the skew model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpq.columnar import Table
from tpq.kernels.lane_table import LanePlan, probe_lane_tables
from tpq.kernels.lane2 import (build_lane2_tables, lane2_probe_emit,
                               plan_lane2)
from tpq.ops._expand import barrier
from tpq.ops.filter import compact
from tpq.ops.union_join import col_planes, union_join

I32 = jnp.int32
L = 128


def nominate_heavy_keys(keys: jnp.ndarray, num_rows, heavy_cap: int = 2048,
                        stride: int = 16, sample_threshold: int = 16):
    """Heavy-key candidates from a strided sample (step 1 above).

    Returns (heavy_keys int64[heavy_cap] — first n_heavy slots live, rest
    zero-filled; n_heavy i32; ok bool — False when more than heavy_cap
    keys cleared the threshold). With stride 16 and threshold 16, a key
    needs ~256+ occurrences to nominate — well below the ~2048-row
    partition slack the light path tolerates."""
    n = keys.shape[0]
    sample = keys[::stride]
    m = sample.shape[0]
    live = (jnp.arange(m, dtype=I32) * stride) < num_rows
    eff = jnp.where(live, sample, jnp.iinfo(keys.dtype).max)
    eff = barrier(eff)
    ks = jax.lax.sort((eff,), num_keys=1, is_stable=True)[0]
    i = jnp.arange(m, dtype=I32)
    new = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    from tpq.ops.scan import cummax_i32

    start = cummax_i32(jnp.where(new, i, -1))
    # run length known at run END positions; nominate there
    nxt_new = jnp.concatenate([new[1:], jnp.ones(1, bool)])
    runlen = i - start + 1
    slive = i < ((num_rows + stride - 1) // stride)
    nominate = nxt_new & (runlen >= sample_threshold) & slive
    kp = [p.astype(I32) for p in col_planes(ks)]
    from tpq.kernels.move import pack

    packed, n_heavy = pack(kp, nominate.astype(I32))
    overflow = n_heavy > heavy_cap
    from tpq.ops.union_join import planes_col

    heavy = planes_col(tuple(p[:heavy_cap].astype(jnp.uint32)
                             for p in packed), keys.dtype)
    return heavy, jnp.minimum(n_heavy, heavy_cap), ~overflow


def _broadcast_plan(build_cap: int, probe_cap: int, depth: int,
                    inline_k: int, out_capacity: int) -> LanePlan:
    """Single-partition lane plan: the whole table is one [depth, 128]
    tile set, probe layout is the identity (no grouping)."""
    return LanePlan(pbits=0, depth=depth, probe_cap=probe_cap,
                    inline_k=inline_k,
                    tail_rows_cap=max(2048, probe_cap >> 6),
                    tail_out_cap=max(4096, min(out_capacity, probe_cap) >> 4))


def _membership(list_tables, t: Table, key: str) -> jnp.ndarray:
    """bool[capacity]: row's key is in the list table (cnt-only walk;
    npart==1 keeps probe order = row order)."""
    _, _, cnt, _, _, qocc, _, _ = probe_lane_tables(list_tables, t, key)
    return (cnt > 0) & (qocc > 0)


def skew_hash_join(r: Table, s: Table, out_capacity: int, key: str = "key",
                   heavy_cap: int = 2048, mini_cap: int = 4096,
                   stride: int = 16, sample_threshold: int = 16,
                   return_ok: bool = False) -> Table:
    """Heavy/light split inner equi-join (module docstring). Oracle
    semantics identical to hash_join; output row order is light matches
    then heavy matches (order is implementation-defined, canonicalized
    for comparisons)."""
    r_names = [n for n in r.names if n != key]
    s_names = [n for n in s.names if n != key]
    r_dtypes = [r.col(n).dtype for n in r_names]

    heavy_keys, n_heavy, ok_nom = nominate_heavy_keys(
        s.col(key), s.num_rows, heavy_cap, stride, sample_threshold)

    # list table: keys only, broadcast layout
    list_plan = _broadcast_plan(heavy_cap, r.capacity, depth=48, inline_k=1,
                                out_capacity=out_capacity)
    list_t = Table({key: heavy_keys}, n_heavy)
    list_tables = build_lane2_tables(list_t, list_plan, key)
    ok_list = list_tables.ok

    r_heavy_mask = _membership(list_tables, r, key)
    # S membership probes the same table; probe_cap must match S capacity
    if s.capacity != r.capacity:
        list_plan_s = _broadcast_plan(heavy_cap, s.capacity, depth=48,
                                      inline_k=1, out_capacity=out_capacity)
        list_tables_s = build_lane2_tables(list_t, list_plan_s, key)
    else:
        list_tables_s = list_tables
    s_heavy_mask = _membership(list_tables_s, s, key)

    # heavy path: R's heavy rows -> small broadcast table, probed by full S
    r_heavy_small = compact(r, r_heavy_mask).with_capacity(mini_cap)
    n_rh = jnp.sum(r_heavy_mask.astype(I32))
    ok_mini_fit = n_rh <= mini_cap
    heavy_out_cap = out_capacity // 2
    mini_plan = _broadcast_plan(mini_cap, s.capacity, depth=64, inline_k=8,
                                out_capacity=heavy_out_cap)
    mini_tables = build_lane2_tables(r_heavy_small, mini_plan, key)
    heavy_out, ok_heavy = lane2_probe_emit(
        mini_tables, s, heavy_out_cap, key=key,
        r_names=r_names, r_dtypes=r_dtypes)

    # light path: plain partitioned lane join on the residual mass
    r_light = compact(r, ~r_heavy_mask)
    s_light = compact(s, ~s_heavy_mask)
    light_plan = plan_lane2(r_light.capacity, s_light.capacity,
                            out_capacity=out_capacity)
    light_tables = build_lane2_tables(r_light, light_plan, key)
    light_out, ok_light = lane2_probe_emit(
        light_tables, s_light, out_capacity, key=key,
        r_names=r_names, r_dtypes=r_dtypes)

    total = light_out.num_rows + heavy_out.num_rows
    ok_splice = (light_out.num_rows + heavy_out_cap) <= out_capacity
    ok = (ok_nom & ok_list & ok_mini_fit & mini_tables.ok & ok_heavy
          & ok_light & ok_splice)

    def splice(_):
        cols = {}
        for n in light_out.names:
            lc, hc = light_out.col(n), heavy_out.col(n)
            cols[n] = jax.lax.dynamic_update_slice(
                lc, hc, (light_out.num_rows,))
        return Table(cols, total)

    def fallback(_):
        return union_join(r, s, out_capacity, key=key)

    if return_ok:
        return ok
    return jax.lax.cond(ok, splice, fallback, operand=None)


def skew_path_taken(r: Table, s: Table, out_capacity: int,
                    key: str = "key", **kw) -> jnp.ndarray:
    """The `ok` flag skew_hash_join conds on — True iff the compiled
    heavy/light split handled this input without falling back to the
    union-sort engine. The bench runner records it so a fallback can
    never masquerade as a skew-split measurement (the round-2 silent-
    fallback failure mode, VERDICT r2 item 6)."""
    return skew_hash_join(r, s, out_capacity, key=key, return_ok=True, **kw)
