"""B1 — config-driven benchmark runner (SURVEY.md §2.4 B1, §3.4).

Runs the BASELINE.json:L6-L12 named presets (tpq/config.py): generates
seed-stable relations, jits the operator (or the fused config-4
pipeline), times warmup+iters with block_until_ready, accounts each run
against the measured-HBM-BW roofline (B2), and emits structured records
(B6) + md/json report (B3).

CLI:  python -m tpq.bench.runner --config=single_chip_1m [--algo=...]
      [--iters=N] [--trace-dir=...] [--json-out=...] [--check]
"""

from __future__ import annotations

import jax
import numpy as np

from tpq import Table
from tpq import datagen
from tpq.bench import roofline
from tpq.bench.report import emit_json, markdown_table
from tpq.config import PRESETS, BenchConfig, RelationSpec
from tpq.log import GLOBAL_LOG
from tpq.ops import hash_join, merge_join
from tpq.query import jit_pipeline
from tpq.trace import annotate, trace_if


def gen(spec: RelationSpec) -> Table:
    return datagen.gen_relation(spec.rows, spec.nkeys, spec.payloads, spec.seed,
                                spec.kind, spec.theta)


def out_capacity_for(cfg: BenchConfig) -> int:
    from tpq.columnar import next_pow2

    base = max(cfg.r.rows, cfg.s.rows)
    return next_pow2(int(base * cfg.join.out_capacity_factor))


def time_fn(fn, args, warmup: int, iters: int) -> tuple[float, object]:
    """Per-execution seconds via the slope method (tpq/bench/timing.py):
    block_until_ready alone returns early over the axon tunnel, so naive
    per-call timing reports dispatch latency, not device time."""
    from tpq.bench.timing import force_sync, slope_time

    counts = tuple(sorted({1, 2, max(4, iters // 2), max(8, iters)}))
    sec, _ = slope_time(fn, args, counts=counts, reps=max(1, min(warmup, 2)))
    out = fn(*args)
    force_sync(out)
    return sec, out


def phase_report(cfg: BenchConfig, hbm_bw: float) -> list[dict]:
    """Per-phase ms of the lane join (VERDICT r2 item 2: the budget that
    localizes the roofline gap). Each phase is separately jitted and
    slope-timed; `emit` is probe_emit minus the bare probe, `other` is
    end-to-end minus the jitted stages (jit-boundary materialization +
    the final fallback-cond plumbing)."""
    from tpq.bench.timing import slope_time
    from tpq.kernels.lane2 import (build_lane2_tables, fused_probe_emit2,
                                   lane2_hash_join, lane2_probe_emit,
                                   plan_lane2)

    r, s = gen(cfg.r), gen(cfg.s)
    jax.block_until_ready((r.columns, s.columns))
    out_cap = out_capacity_for(cfg)
    plan = plan_lane2(r.capacity, s.capacity, out_capacity=out_cap)

    def timed(fn, args):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        sec, _ = slope_time(f, args, reps=2)
        return sec * 1e3

    from tpq.kernels.lane_table import _probe_layout

    t_build = timed(lambda a: build_lane2_tables(a, plan), (r,))
    tables = jax.jit(lambda a: build_lane2_tables(a, plan))(r)
    jax.block_until_ready(tables.occ)
    t_prep = timed(lambda b: _probe_layout(plan, b, "key")[0], (s,))
    t_fused = timed(lambda tb, b: fused_probe_emit2(tb, b, out_cap)[0],
                    (tables, s))
    t_pe = timed(lambda tb, b: lane2_probe_emit(tb, b, out_cap)[0], (tables, s))
    t_e2e = timed(lambda a, b: lane2_hash_join(a, b, out_cap), (r, s))
    return [
        {"phase": "build(sort+pad)", "ms": round(t_build, 3)},
        {"phase": "probe_prep(sort+pad)", "ms": round(t_prep, 3)},
        {"phase": "fused_walk_emit(kernel)", "ms": round(t_fused - t_prep, 3)},
        {"phase": "tail+glue", "ms": round(t_pe - t_fused, 3)},
        {"phase": "other(boundaries)", "ms": round(t_e2e - t_build - t_pe, 3)},
        {"phase": "end_to_end", "ms": round(t_e2e, 3)},
    ]


def run_config(cfg: BenchConfig, hbm_bw: float | None = None, trace_dir: str | None = None) -> dict:
    if hbm_bw is None:
        hbm_bw = roofline.measure_hbm_bw(size_mb=256, iters=5)
    r, s = gen(cfg.r), gen(cfg.s)
    jax.block_until_ready((r.columns, s.columns))
    out_cap = out_capacity_for(cfg)

    results = []
    if cfg.pipeline:
        fn = jit_pipeline(out_cap, algo=cfg.join.algo, join_impl=cfg.join.impl)
        with trace_if(trace_dir), annotate("pipeline"):
            dt, out = time_fn(fn, (r, s, cfg.filter_value), cfg.warmup, cfg.iters)
        bytes_model = (
            roofline.filter_bytes(s.capacity, len(s.columns)).total
            + sum(b.total for b in roofline.hash_join_bytes(
                r.capacity, len(r.columns), s.capacity, len(s.columns), out_cap).values())
            + roofline.aggregate_bytes(out_cap, 2 + (len(r.columns) - 1) + (len(s.columns) - 1)).total
        )
        results.append(roofline.RooflineResult("pipeline", dt, bytes_model, hbm_bw, cfg.s.rows))
    else:
        if cfg.join.algo == "hash":
            def fn(r_, s_):
                return hash_join(r_, s_, out_cap, impl=cfg.join.impl)
            byte_model = roofline.hash_join_bytes(
                r.capacity, len(r.columns), s.capacity, len(s.columns), out_cap)
        else:
            def fn(r_, s_):
                return merge_join(r_, s_, out_cap)
            byte_model = roofline.merge_join_bytes(
                r.capacity, len(r.columns), s.capacity, len(s.columns), out_cap)
        jfn = jax.jit(fn)
        with trace_if(trace_dir), annotate(f"join_{cfg.join.algo}"):
            dt, out = time_fn(jfn, (r, s), cfg.warmup, cfg.iters)
        total_bytes = sum(b.total for b in byte_model.values())
        results.append(roofline.RooflineResult(
            f"join_{cfg.join.algo}_{cfg.join.impl}", dt, total_bytes, hbm_bw, cfg.s.rows))
        if cfg.join.algo == "hash" and cfg.join.impl in ("lane", "skew"):
            # honesty guard (VERDICT r2 item 6): a lane/skew bench row must
            # say whether the compiled path actually ran or the sorted
            # fallback was measured under its label (round 2's bug)
            if cfg.join.impl == "lane":
                from tpq.kernels.lane2 import lane2_path_taken as _taken
            else:
                from tpq.ops.skew_join import skew_path_taken as _taken
            ok = bool(jax.jit(lambda a, b: _taken(a, b, out_cap))(r, s))
            results[-1].op = (f"join_hash_{cfg.join.impl}" if ok
                              else f"join_hash_{cfg.join.impl}_FELL_BACK_TO_SORTED")

    rows = [res.row() for res in results]
    for rec in rows:
        GLOBAL_LOG.emit(config=cfg.name, **rec)
    return {
        "config": cfg.name,
        "hbm_bw_gbps": hbm_bw,
        "out_capacity": out_cap,
        "out_rows": int(out.num_rows),
        "ops": rows,
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="single_chip_1m", choices=sorted(PRESETS))
    p.add_argument("--algo", default=None, choices=[None, "hash", "merge"])
    p.add_argument("--impl", default=None, choices=[None, "lane", "sorted", "skew"])
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--phases", action="store_true",
                   help="also emit the per-phase ms table of the lane join "
                        "(build/probe/emit/other)")
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--json-out", default=None)
    p.add_argument("--log-jsonl", default=None)
    p.add_argument("--scaling", default=None, metavar="N1,N2,...",
                   help="weak-scaling mode: run dist_hash_join at these mesh "
                        "sizes (per-chip rows fixed) and print rows/s/chip + "
                        "efficiency; other config flags are ignored")
    p.add_argument("--rows-per-chip", type=int, default=1 << 16)
    p.add_argument("--exchange", default="dense",
                   choices=["dense", "ragged", "ring"])
    p.add_argument("--n-chunks", type=int, default=1)
    p.add_argument("--check", default=None, metavar="BASELINE_JSON",
                   help="perf-regression mode (SURVEY.md §4.5): compare "
                        "rows_per_sec per op against a stored report; exit 1 "
                        "on regression beyond --tolerance")
    p.add_argument("--tolerance", type=float, default=0.25,
                   help="allowed fractional slowdown in --check mode")
    args = p.parse_args(argv)

    if args.scaling:
        from tpq.bench.scaling import run_weak_scaling
        from tpq.dist import multihost

        multihost.init()  # no-op single-process; wires a pod slice if env set
        sizes = tuple(int(x) for x in args.scaling.split(","))
        rows = run_weak_scaling(rows_per_chip=args.rows_per_chip,
                                mesh_sizes=sizes,
                                exchange_impl=args.exchange,
                                n_chunks=args.n_chunks)
        print(markdown_table(rows, ["n_chips", "rows_total", "elapsed_ms",
                                    "rows_per_sec_per_chip", "efficiency"]))
        if args.json_out:
            emit_json(args.json_out, {"scaling": rows})
        return {"scaling": rows}

    cfg = PRESETS[args.config]
    from dataclasses import replace

    if args.algo or args.impl:
        jn = replace(cfg.join, **({"algo": args.algo} if args.algo else {}),
                     **({"impl": args.impl} if args.impl else {}))
        cfg = replace(cfg, join=jn)
    if args.iters:
        cfg = replace(cfg, iters=args.iters)
    if args.log_jsonl:
        GLOBAL_LOG.path = args.log_jsonl

    report = run_config(cfg, trace_dir=args.trace_dir)
    print(f"# {cfg.name} on {jax.devices()[0].device_kind} "
          f"(HBM {report['hbm_bw_gbps']:.0f} GB/s measured)")
    print(markdown_table(report["ops"],
                         ["op", "elapsed_ms", "sol_ms", "roofline_pct", "rows_per_sec"]))
    if args.phases:
        report["phases"] = phase_report(cfg, report["hbm_bw_gbps"])
        print(markdown_table(report["phases"], ["phase", "ms"]))
    if args.json_out:
        emit_json(args.json_out, report)
    if args.check:
        import json
        import sys

        with open(args.check) as f:
            base = json.load(f)
        base_ops = {op["op"]: op for op in base.get("ops", [])}
        failed = []
        for op in report["ops"]:
            ref = base_ops.get(op["op"])
            if ref is None:
                continue
            floor = ref["rows_per_sec"] * (1.0 - args.tolerance)
            status = "OK" if op["rows_per_sec"] >= floor else "REGRESSED"
            print(f"check {op['op']}: {op['rows_per_sec']:.3e} rows/s vs "
                  f"baseline {ref['rows_per_sec']:.3e} (floor {floor:.3e}) {status}")
            if status != "OK":
                failed.append(op["op"])
        if failed:
            print(f"perf regression in: {', '.join(failed)}", file=sys.stderr)
            sys.exit(1)
    return report


if __name__ == "__main__":
    main()
