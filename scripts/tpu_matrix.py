"""Decisive matrix: isolate final_where / library compact / searchsorted-method."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import tpq
from tpq import datagen, Table
from tpq.ops.hash_join import _composite, hash_join
from tpq.ops._expand import expand_segments, exclusive_cumsum
from tpq.ops.filter import compact

N = 1 << 20
OUT = 1 << 21
R = datagen.gen_relation(N, N, payloads=1, seed=7)
S = datagen.gen_relation(N, N, payloads=1, seed=8)
jax.block_until_ready((R.columns, S.columns))
B = jax.lax.optimization_barrier

def my_expand(counts, capacity, method):
    counts = counts.astype(jnp.int32)
    offsets = B(exclusive_cumsum(counts))
    total = offsets[-1] + counts[-1]
    slot = jnp.arange(capacity, dtype=jnp.int32)
    seg = (jnp.searchsorted(offsets, slot, side="right", method=method) - 1).astype(jnp.int32)
    seg = B(jnp.maximum(seg, 0))
    rank = slot - offsets[seg]
    return seg, rank, total, slot < total

def core(r, s, *, method="scan", final_where=False, lib_compact=False):
    bits = 20
    comp_r = B(_composite(r.col("key"), r.valid_mask(), bits))
    order = B(jnp.argsort(comp_r, stable=True))
    comp_sorted = comp_r[order]
    r_cols = B({k: v[order] for k, v in r.columns.items()})
    comp_s = B(_composite(s.col("key"), s.valid_mask(), bits))
    lower = jnp.searchsorted(comp_sorted, comp_s, side="left", method=method).astype(jnp.int32)
    upper = jnp.searchsorted(comp_sorted, comp_s, side="right", method=method).astype(jnp.int32)
    lower = B(jnp.minimum(lower, r.num_rows))
    upper = B(jnp.minimum(upper, r.num_rows))
    counts = jnp.where(s.valid_mask(), upper - lower, 0)
    seg, rank, total, valid = my_expand(counts, OUT, method)
    r_idx = jnp.minimum(lower[seg] + rank, r.capacity - 1)
    rk = r_cols["key"][r_idx]
    sk = s.col("key")[seg]
    true_match = valid & (rk == sk)
    cols = {"key": jnp.where(valid, sk, 0),
            "r_p0": jnp.where(valid, r_cols["p0"][r_idx], 0),
            "s_p0": jnp.where(valid, s.col("p0")[seg], 0)}
    cols = B(cols)
    if lib_compact:
        out = compact(Table(cols, jnp.minimum(total, jnp.int32(OUT))), true_match)
    else:
        nr = jnp.minimum(total, jnp.int32(OUT))
        keep = true_match & (jnp.arange(OUT, dtype=jnp.int32) < nr)
        keys = B(jnp.where(keep, 0, 1).astype(jnp.uint8))
        perm = B(jnp.argsort(keys, stable=True).astype(jnp.int32))
        out = Table({k: v[perm] for k, v in cols.items()}, jnp.sum(keep, dtype=jnp.int32))
    if final_where:
        out = Table(out.columns, jnp.where(total <= OUT, out.num_rows, total))
    return out

def bench(name, fn, reps=3):
    f = jax.jit(fn)
    t = time.time(); out = jax.block_until_ready(f(R, S)); comp = time.time()-t
    t = time.time()
    for _ in range(reps): out = jax.block_until_ready(f(R, S))
    print(f"{name:30s} compile={comp:5.1f}s run={(time.time()-t)/reps*1e3:8.2f}ms rows={int(out.num_rows)}", flush=True)

bench("base_scan", lambda r, s: core(r, s))
bench("base+final_where", lambda r, s: core(r, s, final_where=True))
bench("base+lib_compact", lambda r, s: core(r, s, lib_compact=True))
bench("base+sortmethod", lambda r, s: core(r, s, method="sort"))
bench("all_three", lambda r, s: core(r, s, method="sort", final_where=True, lib_compact=True))
