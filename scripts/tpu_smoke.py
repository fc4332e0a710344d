"""TPU smoke: do the M1 ops compile+run on the real chip (axon v5e)?"""
import sys, time
sys.path.insert(0, "/root/repo")
t0 = time.time()
import jax, jax.numpy as jnp
import numpy as np
from tpq import Table, datagen
from tpq.ops import filter_table, hash_join, merge_join, hash_aggregate
print(f"[{time.time()-t0:6.1f}s] jax {jax.__version__} devices={jax.devices()}", flush=True)

N = 1 << 20
R = datagen.gen_relation(N, N, payloads=1, seed=7)
S = datagen.gen_relation(N, N, payloads=1, seed=8)
jax.block_until_ready((R.columns, S.columns))
print(f"[{time.time()-t0:6.1f}s] data on device: 2 x {N} rows", flush=True)

OUT_CAP = 1 << 21

@jax.jit
def mj(r, s):
    return merge_join(r, s, OUT_CAP)

@jax.jit
def hj(r, s):
    return hash_join(r, s, OUT_CAP)

@jax.jit
def agg(s):
    return hash_aggregate(s)

@jax.jit
def filt(r):
    return filter_table(r, "key", "lt", N // 2)

for name, fn, args in [("merge_join", mj, (R, S)), ("hash_join", hj, (R, S)),
                        ("aggregate", agg, (S,)), ("filter", filt, (R,))]:
    tc = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - tc
    tr = time.time()
    reps = 3
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    per = (time.time() - tr) / reps
    print(f"[{time.time()-t0:6.1f}s] {name}: rows={int(out.num_rows)} compile={compile_s:.1f}s run={per*1e3:.1f}ms ({N/per/1e6:.0f}M rows/s)", flush=True)
print("SMOKE_OK", flush=True)

# rh-impl join smoke (appended): the Pallas robin-hood path on the real chip
import time as _t
@jax.jit
def hj_rh(r, s):
    return hash_join(r, s, OUT_CAP, impl="rh")
tc = _t.time()
out = jax.block_until_ready(hj_rh(R, S))
comp = _t.time() - tc
tr = _t.time()
for _ in range(3):
    out = jax.block_until_ready(hj_rh(R, S))
per = (_t.time() - tr) / 3
print(f"[{_t.time()-t0:6.1f}s] hash_join_rh: rows={int(out.num_rows)} compile={comp:.1f}s run={per*1e3:.1f}ms ({N/per/1e6:.0f}M rows/s)", flush=True)
print("SMOKE2_OK", flush=True)
