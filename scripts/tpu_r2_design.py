"""Design probes for the round-2 blocked-RH join.

Questions answered (each isolated; prints OK/FAIL + slope-timed ms):
  1. take_along_axis axis=0 across N sublanes (N=32..512): compile? rate?
  2. two-step gather (axis0 row pick, then axis1 lane pick) = arbitrary
     2D gather within an (N,128) block: rate?
  3. XLA sorted+unique scatter 1M -> 2M slots: rate?
  4. PrefetchScalarGridSpec index_map that uses the prefetched scalars
     (data-dependent table-block selection): works?
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.bench.timing import slope_time

I32 = jnp.int32


def pc(*args, **kw):
    inner = pl.pallas_call(*args, **kw)

    def call(*ops):
        with jax.enable_x64(False):
            return inner(*ops)
    return call


def run(name, make, per=None, check=None):
    try:
        fn, args = make()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        if check is not None:
            check(out)
        sec, _ = slope_time(jax.jit(fn), args, reps=2)
        extra = f"  ({per[1](sec):9.2f} {per[0]})" if per else ""
        print(f"{name:48s} {sec*1e3:9.4f} ms{extra}", flush=True)
    except Exception as e:
        msg = " | ".join(str(e).split(chr(10))[:2])[:160]
        print(f"{name:48s} FAIL {type(e).__name__}: {msg}", flush=True)


NT = 256


# ---- 1. axis-0 gather across N sublanes --------------------------------
def axis0_case(N):
    def k(t_ref, i_ref, o_ref):
        t = t_ref[:]
        acc = jnp.zeros((32, 128), I32)
        for d in range(4):
            acc += jnp.take_along_axis(t, (i_ref[:] + d) % N, axis=0)[:32]
        o_ref[:] = acc

    def make():
        t = jnp.arange(N * 128, dtype=I32).reshape(N, 128)
        ix = (jnp.arange(NT * 32 * 128, dtype=I32).reshape(NT * 32, 128) * 2654435761) % N
        f = pc(k, grid=(NT,),
               in_specs=[pl.BlockSpec((N, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                         pl.BlockSpec((32, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
               out_specs=pl.BlockSpec((32, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
               out_shape=jax.ShapeDtypeStruct((NT * 32, 128), I32))
        return f, (t, ix)
    return make


for N in (32, 64, 128, 256, 512):
    run(f"axis0 gather N={N} x4 rounds", axis0_case(N),
        per=("G gath/s", lambda s: 4 * NT * 32 * 128 / s / 1e9))


# ---- 2. two-step 2D gather within (N,128) block -------------------------
def twostep_case(N):
    def k(t_ref, r_ref, l_ref, o_ref):
        t = t_ref[:]
        rows = jnp.take_along_axis(t, r_ref[:] % N, axis=0)[:32]
        o_ref[:] = jnp.take_along_axis(rows, l_ref[:] % 128, axis=1)

    def make():
        t = jnp.arange(N * 128, dtype=I32).reshape(N, 128)
        r = (jnp.arange(NT * 32 * 128, dtype=I32).reshape(NT * 32, 128) * 2654435761) % N
        l = (jnp.arange(NT * 32 * 128, dtype=I32).reshape(NT * 32, 128) * 40503) % 128
        f = pc(k, grid=(NT,),
               in_specs=[pl.BlockSpec((N, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                         pl.BlockSpec((32, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                         pl.BlockSpec((32, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
               out_specs=pl.BlockSpec((32, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
               out_shape=jax.ShapeDtypeStruct((NT * 32, 128), I32))
        return f, (t, r, l)

    def check(out):
        # spot-verify first tile on host
        pass
    return make


for N in (32, 64, 256):
    run(f"twostep 2D gather block N={N}", twostep_case(N),
        per=("G probes/s", lambda s: NT * 32 * 128 / s / 1e9))


# ---- 3. XLA sorted scatter ----------------------------------------------
def sorted_scatter_make():
    n, m = 1 << 20, 1 << 21
    pos = jnp.sort((jnp.arange(n, dtype=I32) * 2) % m)
    v = jnp.arange(n, dtype=I32)

    def f(pos, v):
        tbl = jnp.zeros((m,), I32)
        return tbl.at[pos].set(v, mode="drop", indices_are_sorted=True,
                               unique_indices=True)
    return f, (pos, v)


run("xla sorted scatter 1M->2M", lambda: sorted_scatter_make(),
    per=("M rows/ms", lambda s: 1.048576 / (s * 1e3)))


def plain_scatter_make():
    n, m = 1 << 20, 1 << 21
    pos = (jnp.arange(n, dtype=I32) * 2654435761) % m
    v = jnp.arange(n, dtype=I32)

    def f(pos, v):
        tbl = jnp.zeros((m,), I32)
        return tbl.at[pos].set(v, mode="drop")
    return f, (pos, v)


run("xla random scatter 1M->2M", lambda: plain_scatter_make(),
    per=("M rows/ms", lambda s: 1.048576 / (s * 1e3)))


# ---- 4. scalar-prefetch-driven block index_map --------------------------
def sprefetch_make():
    NBLK, BR = 8, 64          # 8 table blocks of (64,128)
    T = 128                   # probe tiles

    def k(bid_ref, t_ref, q_ref, o_ref):
        o_ref[:] = t_ref[:32] + q_ref[:]

    tbl = jnp.arange(NBLK * BR * 128, dtype=I32).reshape(NBLK * BR, 128)
    q = jnp.zeros((T * 32, 128), I32)
    bid = (jnp.arange(T, dtype=I32) * 5) % NBLK
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(T,),
        in_specs=[pl.BlockSpec((BR, 128), lambda t, s: (s[t], 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((32, 128), lambda t, s: (t, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, 128), lambda t, s: (t, 0), memory_space=pltpu.VMEM))
    f = pc(k, grid_spec=gs, out_shape=jax.ShapeDtypeStruct((T * 32, 128), I32))

    def g(bid, tbl, q):
        return f(bid, tbl, q)
    return g, (bid, tbl, q)


run("scalar-prefetch block index_map", lambda: sprefetch_make(),
    per=("GB/s", lambda s: 128 * 32 * 128 * 4 * 2 / s / 1e9))
