"""Bisect hash_join stages on TPU to find the pathological fusion."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import tpq
from tpq import datagen, Table
from tpq.hashing import hash_keys
from tpq.ops.hash_join import _composite
from tpq.ops._expand import expand_segments
from tpq.ops.filter import compact, compact_indices

N = 1 << 20
OUT = 1 << 21
R = datagen.gen_relation(N, N, payloads=1, seed=7)
S = datagen.gen_relation(N, N, payloads=1, seed=8)
jax.block_until_ready((R.columns, S.columns))

def bench(name, fn, *args, reps=3):
    f = jax.jit(fn)
    t = time.time(); out = jax.block_until_ready(f(*args)); comp = time.time()-t
    t = time.time()
    for _ in range(reps): out = jax.block_until_ready(f(*args))
    print(f"{name:30s} compile={comp:5.1f}s run={(time.time()-t)/reps*1e3:8.2f}ms", flush=True)
    return out

bits = 21
comp_r = bench("composite_r", lambda r: _composite(r.col("key"), r.valid_mask(), bits), R)
order = bench("argsort_comp", lambda c: jnp.argsort(c, stable=True), comp_r)
comp_sorted = comp_r[order]
r_sorted_cols = bench("gather_r_2col", lambda r, o: {k: v[o] for k, v in r.columns.items()}, R, order)
comp_s = _composite(S.col("key"), S.valid_mask(), bits)
lu = bench("searchsorted_x2", lambda cs, q: (jnp.searchsorted(cs, q, side="left"), jnp.searchsorted(cs, q, side="right")), comp_sorted, comp_s)
def counts_fn(lo, hi, s_n):
    lo32 = jnp.minimum(lo.astype(jnp.int32), s_n); hi32 = jnp.minimum(hi.astype(jnp.int32), s_n)
    return jnp.where(jnp.arange(lo.shape[0]) < s_n, hi32-lo32, 0)
counts = bench("counts", counts_fn, lu[0], lu[1], R.num_rows)
seg = bench("expand", lambda c: expand_segments(c, OUT), counts)
def gather_out(seg_id, rank, lo, rcols, scols):
    r_idx = jnp.minimum(lo.astype(jnp.int32)[seg_id] + rank, N*2 - 1)
    out = {"key": scols["key"][seg_id]}
    out["r_p0"] = rcols["p0"][r_idx]
    out["s_p0"] = scols["p0"][seg_id]
    return out
outc = bench("gather_outputs", gather_out, seg[0], seg[1], lu[0], r_sorted_cols, dict(S.columns))
km = bench("keymatch", lambda o, ridx: o["key"]*0+1, outc, seg[0])
def final_compact(cols, valid):
    t = Table(cols, OUT)
    return compact(t, valid)
bench("final_compact_2M_3col", final_compact, outc, seg[3])
bench("compact_indices_only", lambda v: compact_indices(v), seg[3])
