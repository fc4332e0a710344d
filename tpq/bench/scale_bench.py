"""Configs 2 and 4 at full scale (BASELINE.json:L8,L10; VERDICT r3 item
4): chunked build-once/probe-many execution so 100M-row probe sides fit
the 16 GiB chip alongside the build tables.

Both benches:
  * generate relations ON-DEVICE (tpq/datagen.py device twins — byte-
    identical to the oracle's stream; a 100M-row host->device transfer
    through the axon tunnel would otherwise dominate),
  * build the lane tables ONCE, then stream the probe side in chunks of
    `chunk_rows` through the compiled probe+emit (the same
    build-once/probe-many API the distributed join uses per hop),
  * verify against host-side numpy ground truth computed from the same
    seed-stable streams (full-scale count check for the join; exact
    per-group count/sum table compare for the pipeline — SURVEY.md
    §4.4.4's sampled-verification contract, upgraded to exact
    aggregates).

Timing excludes generation and verification (the operator under test is
the join / pipeline, BASELINE.json:L2); per-chunk outputs are consumed
(reduced) on device so chunk buffers recycle.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpq import datagen
from tpq.bench import roofline
from tpq.bench.timing import force_sync
from tpq.columnar import Table, next_pow2
from tpq.kernels.lane2 import (build_lane2_tables, lane2_probe_emit,
                               plan_lane2)

I64 = jnp.int64


def _consume(t: Table) -> jnp.ndarray:
    """Device-side reduction over EVERY output column (so XLA cannot
    dead-code-eliminate any of the join's materialization) — i32 plane
    sums via bitcast, not i64 reductions (v5e has no fast i64 vector
    ALU; the i64 form measured ~5x the join itself at config-2 scale)."""
    import jax.lax as lax

    acc = t.num_rows.astype(jnp.int32)
    mask = t.valid_mask()
    for c in t.columns.values():
        planes = lax.bitcast_convert_type(c, jnp.int32)
        acc = acc ^ jnp.sum(jnp.where(mask[:, None], planes, 0),
                            dtype=jnp.int32)
    return acc


def bench_build_sweep(n_build: int = 10_000_000, n_probe: int = 100_000_000,
                      payloads: int = 4, chunk_rows: int = 1 << 24,
                      verify: bool = True, hbm_bw: float | None = None,
                      log=print) -> dict:
    """Config 2: 10M x 100M, 4 payload cols, probe streamed in chunks."""
    if hbm_bw is None:
        hbm_bw = roofline.measure_hbm_bw(size_mb=256, iters=5)
    r_cap = next_pow2(n_build)
    gen_r = jax.jit(lambda: datagen.gen_relation_device(
        n_build, n_build, payloads, seed=1, capacity=r_cap).columns)
    R = Table(gen_r(), n_build)
    # matches ~ 1 per probe row at these key domains; 1.25x slack (every
    # out_cap-proportional cost — emit buffers, zeroing, plane regroup,
    # consume — scales with this)
    out_cap = chunk_rows + chunk_rows // 4
    plan = plan_lane2(r_cap, chunk_rows, out_capacity=out_cap)
    build = jax.jit(lambda t: build_lane2_tables(t, plan))
    r_names = [n for n in R.names if n != "key"]
    r_dtypes = [R.col(n).dtype for n in r_names]

    nchunks = (n_probe + chunk_rows - 1) // chunk_rows

    # ONE compiled generator serves every chunk (row offset/count are
    # traced) — an eager per-chunk gen dispatches each u64 op separately
    # through the axon tunnel
    gen_chunk = jax.jit(lambda off: datagen.gen_relation_device(
        chunk_rows, n_build, payloads, seed=2, capacity=chunk_rows,
        row_offset=off).columns)

    def gen_c(ci):
        rows = min(chunk_rows, n_probe - ci * chunk_rows)
        return Table(gen_chunk(jnp.uint64(ci * chunk_rows)), rows)

    @jax.jit
    def probe_chunk(tables, s_cols, s_rows):
        s = Table(s_cols, s_rows)
        out, ok = lane2_probe_emit(tables, s, out_cap, key="key",
                                   r_names=r_names, r_dtypes=r_dtypes)
        return out.num_rows.astype(I64), _consume(out), ok

    # compile + warm everything off the clock
    tables = build(R)
    jax.block_until_ready(tables.occ)
    s0 = gen_c(0)
    force_sync(probe_chunk(tables, s0.columns, s0.num_rows))
    del s0

    # build timed on its own (one fresh run; rebuilding INSIDE the chunk
    # loop keeps two 2+ GB table sets alive and thrashes HBM)
    t0 = time.perf_counter()
    tables2 = build(R)
    force_sync(tables2.occ)
    t_build = time.perf_counter() - t0
    del tables2

    # timed sweep: per-chunk (gen + probe + consume), dispatched
    # back-to-back with one data-dependent sync at the end (the only
    # trustworthy timing on the axon tunnel — tpq/bench/timing.py).
    # On-device gen is ~2 streaming passes and is INCLUDED, slightly
    # understating the join's own rows/s. Chunk refs are dropped as soon
    # as the probe is dispatched so at most two chunks' buffers overlap.
    t0 = time.perf_counter()
    total = jnp.int64(0)
    acc = jnp.int64(0)
    oks = []
    for ci in range(nchunks):
        sc = gen_c(ci)
        rows_c, acc_c, ok = probe_chunk(tables, sc.columns, sc.num_rows)
        del sc
        total = total + rows_c
        acc = acc ^ acc_c
        oks.append(ok)
    force_sync((total, acc))
    elapsed = time.perf_counter() - t0 + t_build
    total = int(total)
    all_ok = all(bool(o) for o in oks)

    report = {
        "config": "build_sweep_10m_100m",
        "n_build": n_build, "n_probe": n_probe, "payloads": payloads,
        "nchunks": nchunks, "chunk_rows": chunk_rows,
        "elapsed_ms": elapsed * 1e3,
        "build_ms": t_build * 1e3,
        "probe_rows_per_sec": n_probe / elapsed,
        "out_rows": total,
        "lane_path_taken_all_chunks": all_ok,
        "hbm_bw_gbps": hbm_bw,
    }
    ncols = payloads + 1
    bm = roofline.hash_join_bytes(r_cap, ncols, nchunks * chunk_rows, ncols,
                                  nchunks * out_cap)
    sol_ms = sum(b.total for b in bm.values()) / hbm_bw / 1e6
    report["sol_ms"] = sol_ms
    report["roofline_pct"] = 100.0 * sol_ms / report["elapsed_ms"]

    if verify:
        rk = datagen.uniform_keys(n_build, n_build, seed=1)
        sk = datagen.uniform_keys(n_probe, n_build, seed=2)
        cr = np.bincount(rk, minlength=n_build)
        cs = np.bincount(sk, minlength=n_build)
        expected = int((cr.astype(np.int64) * cs.astype(np.int64)).sum())
        report["expected_rows"] = expected
        report["count_exact"] = (expected == total)
        assert report["count_exact"], (expected, total)
    log(report)
    return report


def bench_pipeline(n_dim: int = 1 << 20, n_fact: int = 100_000_000,
                   fact_payloads: int = 2, chunk_rows: int = 1 << 22,
                   filter_value: int = 1 << 19, verify: bool = True,
                   hbm_bw: float | None = None, staged: bool = True,
                   log=print) -> dict:
    """Config 4 (r5): filter -> hash join -> hash aggregate over a
    100M-row fact table, chunked. Three design changes vs the r4 form
    whose 16M-chunk megaprogram stalled the axon remote compiler:

      * the filter is PUSHED DOWN into the probe grouping sort
        (lane2_probe_emit(keep=...), tpq/query.py's fusion) — the
        standalone filter's multi-operand sort never runs;
      * per-chunk group tables land in a DENSE [n_state] accumulator:
        after `key < filter_value` every group key is in
        [0, filter_value), and a chunk's aggregate emits ascending
        unique keys, so the PAD mover places them at their key slot at
        DMA rate and u32 carry-chain adds fold them in — no
        re-aggregation sort ever sees more than one chunk;
      * staged=True compiles gen / probe+emit / aggregate+accumulate as
        separate programs with progress logs, so a compile stall is
        attributable (and each program is far below the stall size).
    """
    from tpq.kernels.move import pad
    from tpq.ops.filter import compact
    from tpq.ops.hash_aggregate import hash_aggregate
    from tpq.ops.union_join import col_planes, planes_col

    if hbm_bw is None:
        hbm_bw = roofline.measure_hbm_bw(size_mb=256, iters=5)
    dim_cap = next_pow2(n_dim)
    dim = Table(jax.jit(lambda: datagen.gen_relation_device(
        n_dim, n_dim, 1, seed=1, capacity=dim_cap).columns)(), n_dim)
    # ~live_frac of fact rows survive the filter; size the probe layout
    # for the filtered mass (25% margin before plan_lane2's own 1.5x)
    # and the emit buffer for ~1 match per surviving row (1.5x slack)
    live_frac = min(1.0, filter_value / n_dim)
    out_cap = max(1 << 13, int(chunk_rows * live_frac * 3 // 2))
    eff_s_cap = max(1 << 12, int(chunk_rows * min(1.0, live_frac * 1.25)))
    plan = plan_lane2(dim_cap, eff_s_cap, out_capacity=out_cap)
    r_names = [n for n in dim.names if n != "key"]
    r_dtypes = [dim.col(n).dtype for n in r_names]
    build = jax.jit(lambda t: build_lane2_tables(t, plan))

    gen_chunk = jax.jit(lambda off: datagen.gen_relation_device(
        chunk_rows, n_dim, fact_payloads, seed=2, capacity=chunk_rows,
        row_offset=off).columns)

    def gen_c(ci):
        rows = min(chunk_rows, n_fact - ci * chunk_rows)
        return Table(gen_chunk(jnp.uint64(ci * chunk_rows)), rows)

    n_state = next_pow2(min(filter_value, n_dim))
    vnames = (["count"] + [f"sum_r_{n}" for n in r_names]
              + [f"sum_s_p{j}" for j in range(fact_payloads)])
    nplanes = 2 * len(vnames)

    def probe_core(tables, f_cols, f_rows):
        fact = Table(f_cols, f_rows)
        kc = fact.col("key")
        keep = kc < jnp.asarray(filter_value, kc.dtype)
        out, ok = lane2_probe_emit(tables, fact, out_cap, key="key",
                                   r_names=r_names, r_dtypes=r_dtypes,
                                   keep=keep)
        return (dict(out.columns),
                jnp.minimum(out.num_rows, out_cap).astype(jnp.int32), ok)

    def agg_core(state, out_cols, out_rows):
        agg = hash_aggregate(Table(out_cols, out_rows), key="key")
        planes = []
        for n in vnames:
            planes += [p.astype(jnp.int32) for p in col_planes(agg.col(n))]
        dest = jnp.clip(agg.col("key"), 0, n_state - 1).astype(jnp.int32)
        padded, _ = pad(planes, dest, agg.num_rows, n_state)
        new_state, carry = [], None
        for j, (a, b) in enumerate(zip(state, padded)):
            b = b.astype(jnp.uint32)
            if j % 2 == 0:
                lo = a + b
                carry = (lo < a).astype(jnp.uint32)
                new_state.append(lo)
            else:
                new_state.append(a + b + carry)
        return new_state

    @jax.jit
    def finalize(state):
        cols = {"key": jnp.arange(n_state, dtype=jnp.int64)}
        for j, n in enumerate(vnames):
            cols[n] = planes_col((state[2 * j], state[2 * j + 1]), jnp.int64)
        return compact(Table(cols, n_state), cols["count"] > 0)

    state0 = [jnp.zeros(n_state, jnp.uint32) for _ in range(nplanes)]
    nchunks = (n_fact + chunk_rows - 1) // chunk_rows

    if staged:
        probe_j = jax.jit(probe_core)
        agg_j = jax.jit(agg_core)

        def chunk_step(tables, state, f_cols, f_rows):
            out_cols, n_out, ok = probe_j(tables, f_cols, f_rows)
            return agg_j(state, out_cols, n_out), ok
    else:
        @jax.jit
        def chunk_step(tables, state, f_cols, f_rows):
            out_cols, n_out, ok = probe_core(tables, f_cols, f_rows)
            return agg_core(state, out_cols, n_out), ok

    log(f"[pipeline] compiling build (dim {n_dim} rows)...")
    tables = build(dim)
    jax.block_until_ready(tables.occ)
    log("[pipeline] compiling chunk generator...")
    f0 = gen_c(0)
    force_sync(f0.columns)
    if staged:
        log(f"[pipeline] compiling probe+emit (chunk {chunk_rows} rows)...")
        oc_w, n_w, _ = probe_j(tables, f0.columns, f0.num_rows)
        force_sync(n_w)
        log("[pipeline] compiling aggregate+accumulate...")
        st_w = agg_j(state0, oc_w, n_w)
        force_sync(st_w)
        del oc_w, n_w
    else:
        log(f"[pipeline] compiling chunk step (chunk {chunk_rows} rows, "
            f"fused)...")
        st_w, _ = chunk_step(tables, state0, f0.columns, f0.num_rows)
        force_sync(st_w)
    log("[pipeline] compiling finalize...")
    force_sync(finalize(state0).num_rows)
    del f0, st_w

    t0 = time.perf_counter()
    tables2 = build(dim)
    force_sync(tables2.occ)
    t_build = time.perf_counter() - t0
    del tables2

    t0 = time.perf_counter()
    state = state0
    oks = []
    for ci in range(nchunks):
        fc = gen_c(ci)
        state, ok = chunk_step(tables, state, fc.columns, fc.num_rows)
        del fc
        oks.append(ok)
    final = finalize(state)
    force_sync(final.num_rows)
    elapsed = time.perf_counter() - t0 + t_build

    report = {
        "config": "pipeline_100m",
        "n_dim": n_dim, "n_fact": n_fact, "nchunks": nchunks,
        "elapsed_ms": elapsed * 1e3,
        "fact_rows_per_sec": n_fact / elapsed,
        "groups": int(final.num_rows),
        "lane_path_taken_all_chunks": all(bool(o) for o in oks),
        "hbm_bw_gbps": hbm_bw,
    }
    nf = fact_payloads + 1
    bm_filter = roofline.filter_bytes(nchunks * chunk_rows, nf).total
    bm_join = sum(b.total for b in roofline.hash_join_bytes(
        dim_cap, 2, nchunks * chunk_rows, nf, nchunks * out_cap).values())
    bm_agg = roofline.aggregate_bytes(nchunks * out_cap, 4).total
    sol_ms = (bm_filter + bm_join + bm_agg) / hbm_bw / 1e6
    report["sol_ms"] = sol_ms
    report["roofline_pct"] = 100.0 * sol_ms / report["elapsed_ms"]

    if verify:
        fk = datagen.uniform_keys(n_fact, n_dim, seed=2)
        pays = datagen.payload_cols(n_fact, fact_payloads, seed=2)
        dk = datagen.uniform_keys(n_dim, n_dim, seed=1)
        dp = datagen.payload_cols(n_dim, 1, seed=1)
        keep = fk < filter_value
        fk2 = fk[keep]
        dmult = np.bincount(dk, minlength=n_dim).astype(np.int64)
        # exact int sums via np.add.at on int64
        dsum = np.zeros(n_dim, np.int64)
        np.add.at(dsum, dk, dp["p0"])
        cnt_g = np.zeros(n_dim, np.int64)
        np.add.at(cnt_g, fk2, dmult[fk2])
        sum_rp = np.zeros(n_dim, np.int64)
        np.add.at(sum_rp, fk2, dsum[fk2])
        sums_f = {}
        for j in range(fact_payloads):
            v = np.zeros(n_dim, np.int64)
            np.add.at(v, fk2, pays[f"p{j}"][keep] * dmult[fk2])
            sums_f[f"p{j}"] = v
        live = cnt_g > 0
        exp_keys = np.nonzero(live)[0].astype(np.int64)
        got = {k: np.asarray(v)[:int(final.num_rows)]
               for k, v in final.columns.items()}
        order = np.argsort(got["key"], kind="stable")
        got = {k: v[order] for k, v in got.items()}
        assert np.array_equal(got["key"], exp_keys), "group keys differ"
        assert np.array_equal(got["count"], cnt_g[live]), "counts differ"
        assert np.array_equal(got["sum_r_p0"], sum_rp[live]), "dim sums differ"
        for j in range(fact_payloads):
            assert np.array_equal(got[f"sum_s_p{j}"], sums_f[f"p{j}"][live]), \
                f"fact sum p{j} differs"
        report["groups_exact"] = True
    log(report)
    return report


def main(argv=None):
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("which", choices=["sweep", "pipeline"])
    p.add_argument("--json-out", default=None)
    p.add_argument("--chunk-rows", type=int, default=None)
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="pipeline: one jitted chunk program instead of "
                        "staged probe/aggregate programs")
    args = p.parse_args(argv)
    if args.which == "sweep":
        rep = bench_build_sweep(chunk_rows=args.chunk_rows or 1 << 24,
                                verify=not args.no_verify)
    else:
        rep = bench_pipeline(chunk_rows=args.chunk_rows or 1 << 22,
                             verify=not args.no_verify,
                             staged=not args.fused)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rep, f, indent=2, default=str)
    return rep


if __name__ == "__main__":
    main()
