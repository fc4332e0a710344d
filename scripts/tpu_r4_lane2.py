"""Config-1 phase bench of the v3 (lane2) join vs the v2 (lane_table)
join on the real chip, with output-equality cross-check.

Usage: python scripts/tpu_r4_lane2.py [v2] [v3] [phases]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from tpq import datagen
from tpq.bench.timing import slope_time
from tpq.kernels import lane2
from tpq.kernels.lane_table import lane_hash_join, lane_path_taken

WHICH = set(sys.argv[1:]) or {"v2", "v3", "phases"}

r = datagen.gen_relation(1 << 20, 1 << 20, payloads=1, seed=1)
s = datagen.gen_relation(1 << 20, 1 << 20, payloads=1, seed=2)
jax.block_until_ready((r.columns, s.columns))
OUT_CAP = 1 << 22


def timed(name, fn, args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    sec, _ = slope_time(f, args, reps=2)
    print(f"{name:44s} {sec*1e3:9.3f} ms", flush=True)
    return out, sec


def checksum(t):
    tot = np.int64(0)
    n = int(t.num_rows)
    for k, v in t.columns.items():
        tot ^= np.bitwise_xor.reduce(np.sort(np.asarray(v[:n])).view(np.int64))
    return n, int(tot)


ref = None
if "v2" in WHICH:
    out2, _ = timed("v2 lane_hash_join e2e", lambda a, b: lane_hash_join(a, b, OUT_CAP), (r, s))
    ok2 = bool(jax.jit(lambda a, b: lane_path_taken(a, b, OUT_CAP))(r, s))
    ref = checksum(out2)
    print("v2 rows/checksum:", ref, "path_taken:", ok2, flush=True)

if "v3" in WHICH:
    out3, _ = timed("v3 lane2_hash_join e2e", lambda a, b: lane2.lane2_hash_join(a, b, OUT_CAP), (r, s))
    ok3 = bool(jax.jit(lambda a, b: lane2.lane2_path_taken(a, b, OUT_CAP))(r, s))
    got = checksum(out3)
    print("v3 rows/checksum:", got, "path_taken:", ok3, flush=True)
    if ref is not None:
        assert got == ref, (got, ref)
        print("v2/v3 outputs IDENTICAL (rows + xor-of-sorted-columns)", flush=True)

if "phases" in WHICH:
    plan = lane2.plan_lane2(r.capacity, s.capacity, out_capacity=OUT_CAP)
    print(f"plan: npart={plan.npart} D={plan.depth} u={plan.probe_cap}", flush=True)
    tables, t_build = timed("v3 build (sort+pad)",
                            lambda a: lane2.build_lane2_tables(a, plan), (r,))
    jax.block_until_ready(tables.occ)
    from tpq.kernels.lane_table import _probe_layout

    _, t_prep = timed("v3 probe prep (sort+pad)",
                      lambda b: _probe_layout(plan, b, "key")[0], (s,))
    _, t_fused = timed("v3 fused walk+emit kernel",
                       lambda tb, b: lane2.fused_probe_emit2(tb, b, OUT_CAP)[0],
                       (tables, s))
    _, t_pe = timed("v3 probe_emit (fused+tail)",
                    lambda tb, b: lane2.lane2_probe_emit(tb, b, OUT_CAP)[0],
                    (tables, s))
    print(f"phase table: build {t_build*1e3:.2f} | prep(sort) {t_prep*1e3:.2f} | "
          f"fused-prep(kernel) {(t_fused-t_prep)*1e3:.2f} | tail+glue {(t_pe-t_fused)*1e3:.2f}",
          flush=True)
