"""Does optimization_barrier between phases fix the fused-op slowness?"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import tpq
from tpq import datagen, Table
from tpq.ops.hash_join import _composite
from tpq.ops._expand import expand_segments, exclusive_cumsum
from tpq.ops.filter import compact_indices

N = 1 << 20
OUT = 1 << 21
R = datagen.gen_relation(N, N, payloads=1, seed=7)
S = datagen.gen_relation(N, N, payloads=1, seed=8)
jax.block_until_ready((R.columns, S.columns))

B = jax.lax.optimization_barrier

def hj_barrier(r, s):
    bits = 21
    comp_r = B(_composite(r.col("key"), r.valid_mask(), bits))
    order = B(jnp.argsort(comp_r, stable=True))
    comp_sorted = comp_r[order]
    r_cols = B({k: v[order] for k, v in r.columns.items()})
    comp_s = B(_composite(s.col("key"), s.valid_mask(), bits))
    lower = jnp.searchsorted(comp_sorted, comp_s, side="left").astype(jnp.int32)
    upper = jnp.searchsorted(comp_sorted, comp_s, side="right").astype(jnp.int32)
    lower, upper = B((jnp.minimum(lower, r.num_rows), jnp.minimum(upper, r.num_rows)))
    counts = jnp.where(s.valid_mask(), upper - lower, 0)
    seg, rank, total, valid = B(expand_segments(counts, OUT))
    r_idx = jnp.minimum(lower[seg] + rank, r.capacity - 1)
    rk = r_cols["key"][r_idx]
    sk = s.col("key")[seg]
    true_match = valid & (rk == sk)
    cols = {"key": jnp.where(valid, sk, 0),
            "r_p0": jnp.where(valid, r_cols["p0"][r_idx], 0),
            "s_p0": jnp.where(valid, s.col("p0")[seg], 0)}
    cols = B(cols)
    perm, n_out = compact_indices(true_match)
    out_cols = {k: v[perm] for k, v in cols.items()}
    return Table(out_cols, n_out)

def bench(name, fn, *args, reps=3):
    f = jax.jit(fn)
    t = time.time(); out = jax.block_until_ready(f(*args)); comp = time.time()-t
    t = time.time()
    for _ in range(reps): out = jax.block_until_ready(f(*args))
    print(f"{name:24s} compile={comp:5.1f}s run={(time.time()-t)/reps*1e3:8.2f}ms rows={int(out.num_rows)}", flush=True)

bench("hash_join_barriers", hj_barrier, R, S)
from tpq.ops import hash_join, filter_table
bench("hash_join_orig", lambda r, s: hash_join(r, s, OUT), R, S)
