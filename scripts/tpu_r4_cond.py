"""Bisect the config-1 'other(boundaries)' phase: e2e lane2_hash_join
(with the fallback lax.cond) vs the same program without the cond."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import jax

from tpq import datagen
from tpq.bench.timing import slope_time, force_sync
from tpq.kernels import lane2

r = datagen.gen_relation(1 << 20, 1 << 20, payloads=1, seed=1)
s = datagen.gen_relation(1 << 20, 1 << 20, payloads=1, seed=2)
OUT = 1 << 22
plan = lane2.plan_lane2(r.capacity, s.capacity, out_capacity=OUT)


def timed(name, fn):
    f = jax.jit(fn)
    force_sync(f(r, s))
    sec, _ = slope_time(f, (r, s), reps=2)
    print(f"{name:44s} {sec*1e3:9.3f} ms", flush=True)


timed("e2e with fallback cond (lane2_hash_join)",
      lambda a, b: lane2.lane2_hash_join(a, b, OUT, plan=plan))


def no_cond(a, b):
    tables = lane2.build_lane2_tables(a, plan)
    out, ok = lane2.lane2_probe_emit(tables, b, OUT,
                                     r_names=["p0"],
                                     r_dtypes=[a.col("p0").dtype])
    return out


timed("build+probe_emit, no cond", no_cond)


def no_cond_narrow(a, b):
    tables = lane2.build_lane2_tables(a, plan)
    out, ok = lane2.lane2_probe_emit(tables, b, OUT,
                                     r_names=["p0"],
                                     r_dtypes=[a.col("p0").dtype])
    return out.num_rows, ok


timed("build+probe_emit, num_rows only (DCE cols)", no_cond_narrow)
