"""Bisect the build_lane_tables hang: time sort, pad, transpose separately."""
import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from tpq import datagen
from tpq.hashing import hash_keys
from tpq.ops.union_join import col_planes
from tpq.kernels.move import pad
from tpq.kernels.lane_table import plan_lane
from tpq.bench.timing import force_sync

N = 1 << 20
r = datagen.gen_relation(N, N, payloads=1, seed=1)
jax.block_until_ready(r.columns)
plan = plan_lane(N, N, out_capacity=1 << 22)
print("plan", plan, flush=True)


def stage(name, fn, *args):
    t0 = time.time()
    f = jax.jit(fn)
    out = f(*args)
    force_sync(out)
    t1 = time.time()
    out2 = f(*args)
    force_sync(out2)
    t2 = time.time()
    print(f"{name:30s} compile+run {t1-t0:7.1f}s  warm {t2-t1:7.3f}s", flush=True)
    return out


def sort_stage(a):
    rk = a.col("key")
    valid = a.valid_mask()
    h = hash_keys(rk, plan.pbits + 7, 0x1A9E0001)
    bucket = jnp.where(valid, h, plan.nbuckets).astype(jnp.int32)
    kp = list(col_planes(rk))
    pays = [p for n in a.names if n != "key" for p in col_planes(a.col(n))]
    ops = jax.lax.optimization_barrier((bucket, *kp, *pays))
    return jax.lax.sort(ops, num_keys=3, is_stable=True)

sorted_ops = stage("hash+sort", sort_stage, r)

from tpq.kernels.lane_table import _rank_in_group

def pad_stage(sorted_ops, n_live):
    bucket_s = sorted_ops[0]
    planes_s = [x.astype(jnp.int32) for x in sorted_ops[1:]]
    rank = _rank_in_group(bucket_s)
    live = bucket_s < plan.nbuckets
    dest = jnp.where(live & (rank < plan.depth),
                     bucket_s * plan.depth + rank, plan.nbuckets * plan.depth)
    padded, occ = pad(planes_s, dest, n_live, plan.nbuckets * plan.depth)
    return padded, occ

padded, occ = stage("rank+pad", pad_stage, sorted_ops, jnp.int32(N))

def transpose_stage(padded, occ):
    def to_tiles(x):
        return jnp.swapaxes(x.reshape(plan.npart, 128, plan.depth), 1, 2)
    return [to_tiles(x) for x in padded] + [to_tiles(occ)]

tiles = stage("transpose", transpose_stage, padded, occ)
print("done", flush=True)
