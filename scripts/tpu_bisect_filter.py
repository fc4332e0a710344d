"""Bisect filter slowness: which sub-op poisons the composition?"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import tpq
from tpq import datagen, Table
from tpq.ops import filter_table

N = 1 << 20
R = datagen.gen_relation(N, N, payloads=1, seed=7)
jax.block_until_ready(R.columns)
B = jax.lax.optimization_barrier

def bench(name, fn, *args, reps=3):
    f = jax.jit(fn)
    t = time.time(); out = jax.block_until_ready(f(*args)); comp = time.time()-t
    t = time.time()
    for _ in range(reps): out = jax.block_until_ready(f(*args))
    print(f"{name:34s} compile={comp:5.1f}s run={(time.time()-t)/reps*1e3:8.2f}ms", flush=True)

def fa(r):  # bare: mask -> u8 -> argsort -> gathers, no mask-AND, no sum
    keep = r.col("key") < (N // 2)
    keys = B(jnp.where(keep, 0, 1).astype(jnp.uint8))
    perm = jnp.argsort(keys, stable=True)
    return {k: v[perm] for k, v in r.columns.items()}

def fb(r):  # + valid_mask AND
    keep = (r.col("key") < (N // 2)) & r.valid_mask()
    keys = B(jnp.where(keep, 0, 1).astype(jnp.uint8))
    perm = jnp.argsort(keys, stable=True)
    return {k: v[perm] for k, v in r.columns.items()}

def fc(r):  # + sum
    keep = (r.col("key") < (N // 2)) & r.valid_mask()
    keys = B(jnp.where(keep, 0, 1).astype(jnp.uint8))
    perm = jnp.argsort(keys, stable=True)
    n = jnp.sum(keep, dtype=jnp.int32)
    return {k: v[perm] for k, v in r.columns.items()}, n

def fd(r):  # barrier(perm) too
    keep = (r.col("key") < (N // 2)) & r.valid_mask()
    keys = B(jnp.where(keep, 0, 1).astype(jnp.uint8))
    perm = B(jnp.argsort(keys, stable=True).astype(jnp.int32))
    n = jnp.sum(keep, dtype=jnp.int32)
    return {k: v[perm] for k, v in r.columns.items()}, n

def fe(r):  # multi-operand lax.sort compaction instead of argsort+gather
    keep = (r.col("key") < (N // 2)) & r.valid_mask()
    keys = B(jnp.where(keep, 0, 1).astype(jnp.int32))
    ops = jax.lax.sort((keys, r.col("key"), r.col("p0")), num_keys=1, is_stable=True)
    n = jnp.sum(keep, dtype=jnp.int32)
    return {"key": ops[1], "p0": ops[2]}, n

bench("fa_bare", fa, R)
bench("fb_valid_and", fb, R)
bench("fc_plus_sum", fc, R)
bench("fd_barrier_perm", fd, R)
bench("fe_multisort", fe, R)
bench("f_library", lambda r: filter_table(r, "key", "lt", N // 2), R)
