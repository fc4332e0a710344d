"""Round-3 phase budget: lane-join stages at config-1 scale on the chip
(VERDICT r2 item 2). Primitive costs measured 2026-08-20:
  lax.sort 1M 1k+4v 3.19ms / 3k+4v 4.44ms; 2M 7.3/10.5; 4M 17.5/25.2
  pad 1M->4M x5 1.42ms; 1M->2M 0.90ms; pack 4M x7 2.86ms; 8M x7 5.67ms
"""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from tpq import Table, datagen
from tpq.bench.timing import slope_time
from tpq.verify import multiset_checksum

N = 1 << 20
CAP = 1 << 22
r = datagen.gen_relation(N, N, payloads=1, seed=1)
s = datagen.gen_relation(N, N, payloads=1, seed=2)
jax.block_until_ready((r.columns, s.columns))


def t(name, fn, *args, reps=2):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    sec, pts = slope_time(f, args, reps=reps)
    print(f"{name:44s} {sec*1e3:9.3f} ms", flush=True)
    return sec


from tpq.kernels.lane_table import (plan_lane, build_lane_tables,
                                    lane_probe_emit, probe_lane_tables,
                                    lane_hash_join)

plan = plan_lane(r.capacity, s.capacity, out_capacity=CAP)
print("plan:", plan, flush=True)

sec_b = t("build_lane_tables (sort+pad+reshape)",
          lambda a: build_lane_tables(a, plan), r)
tables = jax.jit(lambda a: build_lane_tables(a, plan))(r)
jax.block_until_ready(tables.occ)
sec_p = t("probe_lane_tables (sort+pad+kernel)",
          lambda tb, b: probe_lane_tables(tb, b)[2], tables, s)
sec_pe = t("lane_probe_emit (probe+tail+pack)",
           lambda tb, b: lane_probe_emit(tb, b, CAP)[0], tables, s)
sec_e2e = t("lane_hash_join end-to-end",
            lambda a, b: lane_hash_join(a, b, CAP), a := r, b := s)
print(f"  => build {sec_b*1e3:.2f} probe {sec_p*1e3:.2f} "
      f"emit {(sec_pe-sec_p)*1e3:.2f} other {(sec_e2e-sec_b-sec_pe)*1e3:.2f}",
      flush=True)

out = jax.jit(lambda a, b: lane_hash_join(a, b, CAP))(r, s)
print("lane rows:", int(out.num_rows), "checksum:",
      hex(int(multiset_checksum(out))), flush=True)

from tpq.ops.union_join import union_join
out2 = jax.jit(lambda a, b: union_join(a, b, CAP))(r, s)
print("sorted rows:", int(out2.num_rows), "checksum:",
      hex(int(multiset_checksum(out2))), flush=True)
t("union_join (sorted impl) end-to-end", lambda a, b: union_join(a, b, CAP), r, s)
print("done", flush=True)
