"""Lane-bucket hash join end-to-end on the chip: correctness vs the sorted
impl + per-phase timing at config-1 scale."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
import tpq
from tpq import Table, datagen
from tpq.ops import hash_join
from tpq.bench.timing import slope_time
from tpq.verify import multiset_checksum

N = 1 << 20
r = datagen.gen_relation(N, N, payloads=1, seed=1)
s = datagen.gen_relation(N, N, payloads=1, seed=2)
jax.block_until_ready((r.columns, s.columns))
cap = 1 << 22

for impl in ("lane", "sorted"):
    f = jax.jit(lambda a, b, impl=impl: hash_join(a, b, cap, impl=impl))
    out = jax.block_until_ready(f(r, s))
    ck = int(multiset_checksum(out))
    sec, _ = slope_time(f, (r, s), reps=2)
    print(f"{impl:8s} rows={int(out.num_rows):9d} checksum={ck:#x} "
          f"{sec*1e3:8.2f} ms  ({int(out.num_rows)/sec/1e6:8.1f} M rows/s)", flush=True)

# phase breakdown for lane
from tpq.kernels.lane_table import plan_lane, build_lane_tables, probe_lane_tables
plan = plan_lane(r.capacity, s.capacity, out_capacity=cap)
print("plan:", plan, flush=True)
fb = jax.jit(lambda a: build_lane_tables(a, plan))
tb = jax.block_until_ready(fb(r))
sec_b, _ = slope_time(fb, (r,), reps=2)
fp = jax.jit(lambda t, b: probe_lane_tables(t, b))
jax.block_until_ready(fp(tb, s)[2])
sec_p, _ = slope_time(fp, (tb, s), reps=2)
print(f"build: {sec_b*1e3:8.2f} ms   probe(+pad): {sec_p*1e3:8.2f} ms", flush=True)
