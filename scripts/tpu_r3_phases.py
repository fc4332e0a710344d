"""Round-3 phase budget: time EVERY stage of the lane join at config-1
scale on the chip, plus the raw primitives (multi-operand lax.sort, PAD,
PACK, probe kernel), so the 122.6 ms -> SoL 0.29 ms gap gets localized
(VERDICT r2 items 2/6)."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from tpq import Table, datagen
from tpq.bench.timing import slope_time

N = 1 << 20
CAP = 1 << 22
r = datagen.gen_relation(N, N, payloads=1, seed=1)
s = datagen.gen_relation(N, N, payloads=1, seed=2)
jax.block_until_ready((r.columns, s.columns))


def t(name, fn, *args, reps=2):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    sec, r2 = slope_time(f, args, reps=reps)
    print(f"{name:42s} {sec*1e3:9.3f} ms  (fit r2={r2:.4f})", flush=True)
    return sec


# ---- primitives --------------------------------------------------------
key = jax.random.PRNGKey(0)
for n in (1 << 20, 1 << 21, 1 << 22):
    ops = tuple(jax.random.randint(jax.random.fold_in(key, i), (n,), 0, 1 << 30,
                                   dtype=jnp.int32) for i in range(7))
    t(f"lax.sort 1key+4val n={n>>20}M", lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True), *ops[:5])
    t(f"lax.sort 3key+4val n={n>>20}M", lambda *o: jax.lax.sort(o, num_keys=3, is_stable=True), *ops)

from tpq.kernels.move import pad, pack

n = 1 << 20
planes = [jax.random.randint(jax.random.fold_in(key, 10 + i), (n,), 0, 1 << 30, dtype=jnp.int32)
          for i in range(5)]
dest = jnp.arange(n, dtype=jnp.int32) * 4  # 4x spread -> out 4M
t("pad 1M->4M x5 planes", lambda *p: pad(list(p), dest, n, 1 << 22), *planes)
dest2 = jnp.arange(n, dtype=jnp.int32) * 2
t("pad 1M->2M x5 planes", lambda *p: pad(list(p), dest2, n, 1 << 21), *planes)

for m in (1 << 22, 1 << 23):
    big = [jax.random.randint(jax.random.fold_in(key, 20 + i), (m,), 0, 1 << 30, dtype=jnp.int32)
           for i in range(7)]
    occ = (jax.random.uniform(jax.random.fold_in(key, 30), (m,)) < 0.25).astype(jnp.int32)
    t(f"pack {m>>20}M x7 planes", lambda *p: pack(list(p[:-1]), p[-1]), *big, occ)

# ---- lane join stages --------------------------------------------------
from tpq.kernels.lane_table import (plan_lane, build_lane_tables,
                                    probe_lane_tables, lane_hash_join)
from tpq.hashing import hash_keys
from tpq.ops.union_join import col_planes

plan = plan_lane(r.capacity, s.capacity, out_capacity=CAP)
print("plan:", plan, flush=True)

t("build_lane_tables (sort+pad+reshape)", lambda a: build_lane_tables(a, plan), r)

# build sub-stages
def build_sort(a):
    rk = a.col("key")
    h = hash_keys(rk, plan.pbits + 7, 0x1A9E0001)
    bucket = jnp.where(a.valid_mask(), h, plan.nbuckets).astype(jnp.int32)
    kp = list(col_planes(rk))
    pays = [p for nme in a.names if nme != "key" for p in col_planes(a.col(nme))]
    return jax.lax.sort((bucket, *kp, *pays), num_keys=3, is_stable=True)
t("  build: hash+sort", build_sort, r)

tables = jax.jit(lambda a: build_lane_tables(a, plan))(r)
jax.block_until_ready(tables.occ)
t("probe_lane_tables (sort+pad+kernel)", lambda tb, b: probe_lane_tables(tb, b)[2], tables, s)

def probe_sort(b):
    sk = b.col("key")
    h = hash_keys(sk, plan.pbits + 7, 0x1A9E0001)
    p_ = (h >> 7).astype(jnp.int32)
    lane = (h & 127).astype(jnp.int32)
    bucket_p = jnp.where(b.valid_mask(), p_, plan.npart).astype(jnp.int32)
    kp = list(col_planes(sk))
    pays = [pl_ for nme in b.names if nme != "key" for pl_ in col_planes(b.col(nme))]
    return jax.lax.sort((bucket_p, lane, *kp, *pays), num_keys=1, is_stable=True)
t("  probe: hash+sort", probe_sort, s)

t("lane_hash_join end-to-end", lambda a, b: lane_hash_join(a, b, CAP), r, s)

from tpq.ops.union_join import union_join
t("union_join (sorted impl) end-to-end", lambda a, b: union_join(a, b, CAP), r, s)
print("done", flush=True)
