"""Primitive microbenchmarks on TPU: find what's slow."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
import tpq  # noqa: x64 + cache

def bench(name, fn, *args, reps=5):
    tc = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    comp = time.time() - tc
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    per = (time.time() - t0) / reps
    print(f"{name:36s} compile={comp:6.1f}s run={per*1e3:8.2f}ms", flush=True)
    return out

N = 1 << 20
M = 1 << 21
key = np.random.default_rng(0)
ki64 = jnp.asarray(key.integers(0, 1 << 62, N, dtype=np.int64))
ku8 = jnp.asarray(key.integers(0, 2, M, dtype=np.uint8))
ki32 = ku8.astype(jnp.int32)
vi64 = jnp.asarray(key.integers(0, 1 << 62, M, dtype=np.int64))
perm = jnp.asarray(key.permutation(M).astype(np.int32))

bench("argsort_i64_1M", lambda x: jnp.argsort(x, stable=True), ki64)
bench("argsort_u8_2M", lambda x: jnp.argsort(x, stable=True), ku8)
bench("argsort_i32_2M", lambda x: jnp.argsort(x, stable=True), ki32)
bench("gather_perm_i64_2M", lambda v, p: v[p], vi64, perm)
bench("cumsum_i64_2M", jnp.cumsum, vi64)
bench("cumsum_i32_2M", lambda x: jnp.cumsum(x.astype(jnp.int32)), ku8)
bench("searchsorted_1M_into_1M", lambda a, q: jnp.searchsorted(jnp.sort(a), q), ki64, ki64)
def multisort(k, v):
    return jax.lax.sort((k, v), num_keys=1)
bench("lax.sort_(i32key,i64val)_2M", multisort, ki32, vi64)
def multisort4(k, a, b, c):
    return jax.lax.sort((k, a, b, c), num_keys=1)
bench("lax.sort_(i32key,3xi64)_2M", multisort4, ki32, vi64, vi64, vi64)
bench("sort_u8_2M", lambda x: jnp.sort(x), ku8)
bench("where_select_2M", lambda v: jnp.where(v > 0, v, 0), vi64)
