"""Canonical per-op TPU timings with the current library code."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import tpq
from tpq import datagen
from tpq.ops import filter_table, hash_join, merge_join, hash_aggregate
from tpq.query import jit_pipeline

N = 1 << 20
OUT = 1 << 21
R = datagen.gen_relation(N, N, payloads=1, seed=7)
S = datagen.gen_relation(N, N, payloads=1, seed=8)
jax.block_until_ready((R.columns, S.columns))

def bench(name, fn, *args, reps=5):
    f = jax.jit(fn)
    t = time.time(); out = jax.block_until_ready(f(*args)); comp = time.time() - t
    t = time.time()
    for _ in range(reps): out = jax.block_until_ready(f(*args))
    per = (time.time() - t) / reps
    print(f"{name:22s} compile={comp:5.1f}s run={per*1e3:9.2f}ms ({N/per/1e9:6.2f}G rows/s) rows={int(out.num_rows)}", flush=True)

bench("filter", lambda r: filter_table(r, "key", "lt", N // 2), R)
bench("merge_join", lambda r, s: merge_join(r, s, OUT), R, S)
bench("hash_join_sorted", lambda r, s: hash_join(r, s, OUT), R, S)
bench("hash_join_rh", lambda r, s: hash_join(r, s, OUT, impl="rh"), R, S)
bench("aggregate", hash_aggregate, S)
pipe = jit_pipeline(OUT)
bench("pipeline", lambda r, s: pipe(r, s, N // 2), R, S)
print("OPS_BENCH_OK", flush=True)
