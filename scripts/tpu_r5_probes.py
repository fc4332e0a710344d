"""r5 probe A — localize config-1's `other(boundaries)` phase (2.7 ms:
e2e 13.4 vs build 4.5 + probe_emit 6.3 separately jitted) and price the
candidate cuts, on-chip.

Variants, all warm-timed with the slope method on config-1 relations:
  e2e        lane2_hash_join as benched (build + probe + ok + cond)
  nocond     build + probe_emit in ONE jit, returning (Table, ok) — no
             lax.cond fallback branch
  planes     nocond, but returning the raw merged u32 planes (no
             planes_col i64 reconstruction of output columns)
  nozero     planes, without the slot_live zeroing of the fused buffer
  i32tot     nocond with total/inline sums in i32 (u * D < 2^31 here)
             instead of .astype(int64) sums
  dispatch   a jitted identity on the same pytrees (dispatch floor)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jaxcache"))

import jax
import jax.numpy as jnp

from tpq import datagen
from tpq.bench.timing import slope_time
from tpq.columnar import Table
from tpq.kernels.lane2 import (build_lane2_tables, fused_probe_emit2,
                               lane2_hash_join, lane2_probe_emit, plan_lane2)

I32 = jnp.int32


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


N = 1 << 20
OUT_CAP = 1 << 22


def probe_emit_variant(tables, s, out_capacity, key="key", r_names=None,
                       r_dtypes=None, ret="table", i32_totals=False,
                       zero=True):
    """Stripped copy of lane_table._probe_emit_common with toggles; tail
    cond kept identical (it executes no_tail on config-1 uniform keys)."""
    from tpq.kernels.lane_table import _probe_emit_common
    from tpq.ops.union_join import planes_col

    plan = tables.plan
    K = plan.inline_k
    if ret == "table" and not i32_totals:
        return _probe_emit_common(fused_probe_emit2, tables, s, out_capacity,
                                  key, r_names, r_dtypes, False)
    (out_planes, cnt, d_first, qk_p, spay_p, qocc, lane_p,
     probe_ovf) = fused_probe_emit2(tables, s, out_capacity, key, False)
    live_q = qocc > 0
    cnt_eff = jnp.where(live_q, cnt, 0)
    if i32_totals:
        total = jnp.sum(cnt_eff)
        total_inline = jnp.sum(jnp.minimum(cnt_eff, K))
        tail_out = total - total_inline
    else:
        total64 = jnp.sum(cnt_eff.astype(jnp.int64))
        total = jnp.minimum(total64, jnp.int64(2**31 - 1)).astype(I32)
        inline64 = jnp.sum(jnp.minimum(cnt_eff, K).astype(jnp.int64))
        total_inline = jnp.minimum(inline64, jnp.int64(2**31 - 1)).astype(I32)
        tail_out = (total64 - inline64).astype(I32)
    tail_rows = jnp.sum((cnt_eff > K).astype(I32))
    caps_ok = (tail_rows <= plan.tail_rows_cap) & \
        (tail_out <= plan.tail_out_cap) & (total_inline <= out_capacity)
    ok = tables.ok & (~probe_ovf) & caps_ok

    if zero:
        slot_live = jnp.arange(out_capacity, dtype=I32) < total_inline
        base = [jnp.where(slot_live, p, 0) for p in out_planes]
    else:
        base = list(out_planes)
    if ret == "planes":
        return base, total, ok
    # table: regroup u32 planes into i64/i32 named columns (key + 1 R pay
    # + 1 S pay at config-1 = 3 i64 cols = 6 planes)
    cols = {}
    pos = 0
    s_names = [n for n in s.names if n != key]
    groups = [(key, 2)] + [(f"r_{n}", 2) for n in (r_names or [])] \
        + [(f"s_{n}", 2) for n in s_names]
    for name, npl in groups:
        cols[name] = planes_col(
            tuple(p.astype(jnp.uint32) for p in base[pos:pos + npl]),
            jnp.int64)
        pos += npl
    return Table(cols, total), ok


def main():
    log("gen…")
    r = Table(jax.jit(lambda: datagen.gen_relation_device(
        N, N, 1, seed=1, capacity=N).columns)(), N)
    s = Table(jax.jit(lambda: datagen.gen_relation_device(
        N, N, 1, seed=2, capacity=N).columns)(), N)
    jax.block_until_ready((r.columns, s.columns))
    plan = plan_lane2(N, N, out_capacity=OUT_CAP)
    r_names = [n for n in r.names if n != "key"]
    r_dtypes = [r.col(n).dtype for n in r_names]

    def timed(name, fn, args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        log(f"  {name}: compiled+first-run {time.perf_counter()-t0:.1f}s")
        sec, _detail = slope_time(f, args, reps=2)
        log(f"  {name}: {sec*1e3:.3f} ms")
        return sec * 1e3

    results = {}
    log("A e2e (as benched)…")
    results["e2e"] = timed("e2e", lambda a, b: lane2_hash_join(a, b, OUT_CAP),
                           (r, s))

    log("B nocond…")

    def nocond(a, b):
        t = build_lane2_tables(a, plan)
        return lane2_probe_emit(t, b, OUT_CAP, r_names=r_names,
                                r_dtypes=r_dtypes)

    results["nocond"] = timed("nocond", nocond, (r, s))

    log("C planes…")

    def planes(a, b):
        t = build_lane2_tables(a, plan)
        return probe_emit_variant(t, b, OUT_CAP, r_names=r_names,
                                  r_dtypes=r_dtypes, ret="planes")

    results["planes"] = timed("planes", planes, (r, s))

    log("D nozero…")

    def nozero(a, b):
        t = build_lane2_tables(a, plan)
        return probe_emit_variant(t, b, OUT_CAP, r_names=r_names,
                                  r_dtypes=r_dtypes, ret="planes", zero=False)

    results["nozero"] = timed("nozero", nozero, (r, s))

    log("E i32tot…")

    def i32tot(a, b):
        t = build_lane2_tables(a, plan)
        return probe_emit_variant(t, b, OUT_CAP, r_names=r_names,
                                  r_dtypes=r_dtypes, ret="table",
                                  i32_totals=True)

    results["i32tot"] = timed("i32tot", i32tot, (r, s))

    log("F dispatch floor…")
    results["dispatch"] = timed(
        "dispatch", lambda a, b: (a.col("key") + 0, b.col("key") + 0), (r, s))

    log("G build alone / probe_emit alone (phase cross-check)…")
    results["build"] = timed("build", lambda a: build_lane2_tables(a, plan),
                             (r,))
    tables = jax.jit(lambda a: build_lane2_tables(a, plan))(r)
    jax.block_until_ready(tables.occ)
    results["probe_emit"] = timed(
        "probe_emit",
        lambda t, b: lane2_probe_emit(t, b, OUT_CAP, r_names=r_names,
                                      r_dtypes=r_dtypes), (tables, s))

    print("\n=== summary (ms) ===", flush=True)
    for k, v in results.items():
        print(f"  {k:12s} {v:8.3f}", flush=True)
    print(f"  cond+glue        {results['e2e']-results['nocond']:8.3f} "
          "(e2e - nocond)", flush=True)
    print(f"  planes_col       {results['nocond']-results['planes']:8.3f} "
          "(nocond - planes)", flush=True)
    print(f"  zeroing          {results['planes']-results['nozero']:8.3f} "
          "(planes - nozero)", flush=True)
    print(f"  i64 totals       {results['nocond']-results['i32tot']:8.3f} "
          "(nocond - i32tot)", flush=True)
    print(f"  split-jit delta  "
          f"{results['e2e']-results['build']-results['probe_emit']:8.3f} "
          "(e2e - build - probe_emit)", flush=True)


if __name__ == "__main__":
    main()
