"""Round-2 primitive probes on the real v5e — the measurements that decide
the partitioned robin-hood probe kernel design (VERDICT.md next-round #1/#2).

Questions answered (each guarded; one failure doesn't kill the rest):
  S*  lax.sort cost vs rows x operands (partition-pass candidate)
  G*  XLA gather cost: 1D random, 2D padded monotone (padded_gather shape)
  P*  Pallas: stream BW, lane-gather (8,128), wide gather (8,256),
      sublane gather axis=0, roll, masked store, dynamic-offset DMA store
      with an SMEM running cursor (the compacted-emit pattern)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.bench.timing import slope_time

I32 = jnp.int32
results = {}


def run(name, fn, *args, per=None, unit=""):
    try:
        sec, pts = slope_time(jax.jit(fn), args, reps=2)
        ms = sec * 1e3
        extra = ""
        if per:
            extra = f"  ({per[1](sec):.3f} {per[0]})"
        print(f"{name:44s} {ms:10.4f} ms{extra}")
        results[name] = ms
        return sec
    except Exception as e:  # noqa
        msg = str(e).split(chr(10))[0][:140]
        print(f"{name:44s} FAIL: {type(e).__name__}: {msg}")
        results[name] = None
        return None


key = jax.random.PRNGKey(0)


# ---------------- S: lax.sort scaling ----------------
def sort_bench(n, nops, nkeys=1):
    ops = tuple(jax.random.randint(jax.random.fold_in(key, i), (n,), 0, 1 << 30, I32)
                for i in range(nops))

    def f(*xs):
        xs = jax.lax.optimization_barrier(xs)
        return jax.lax.sort(xs, num_keys=nkeys, is_stable=True)
    return f, ops


for n in (1 << 20, 4 << 20):
    for nops in (2, 4, 8):
        f, ops = sort_bench(n, nops)
        run(f"sort n={n>>20}M ops={nops} keys=1", f, *ops)
f, ops = sort_bench(1 << 21, 9, nkeys=3)
run("sort n=2M ops=9 keys=3 (union-join shape)", f, *ops)

# ---------------- G: XLA gathers ----------------
n = 1 << 20
src = jax.random.randint(key, (n,), 0, 1 << 30, I32)
idx_rand = jax.random.randint(jax.random.fold_in(key, 9), (n,), 0, n, I32)
idx_mono = jnp.arange(n, dtype=I32)

run("xla gather 1D random 1M", lambda s, i: s[i], src, idx_rand)
run("xla gather 1D monotone 1M", lambda s, i: s[i], src, idx_mono)
npart, cap = 1024, 2048
starts = jnp.sort(jax.random.randint(jax.random.fold_in(key, 10), (npart,), 0, n, I32))
src2 = src


def padded2d(s, st):
    i = jnp.arange(cap, dtype=I32)[None, :]
    ix = jnp.minimum(st[:, None] + i, n - 1)
    return s[ix]


run("xla gather 2D padded 1024x2048 from 1M", padded2d, src2, starts)

# take_along_axis big 2D: [npart, cap] planes gathered rowwise
tab2 = jax.random.randint(key, (npart, cap), 0, 1 << 30, I32)
gidx = jax.random.randint(jax.random.fold_in(key, 11), (npart, cap), 0, cap, I32)
run("xla take_along_axis 1024x2048 rowwise", lambda t, g: jnp.take_along_axis(t, g, axis=1), tab2, gidx)

# ---------------- P: Pallas probes ----------------
NT = 2048      # grid tiles
ROWS = 64      # sublane rows per tile (ROWS,128) per step


def stream_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


x = jnp.zeros((NT * ROWS, 128), I32)
run("pallas stream r+w 64MiB", lambda a: pl.pallas_call(
    stream_kernel, grid=(NT,),
    in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NT * ROWS, 128), I32))(a), x,
    per=("GB/s", lambda s: 2 * x.size * 4 / s / 1e9))

R = 32  # gather rounds per tile


def lane_gather_kernel(w, tab_ref, idx_ref, o_ref):
    t = tab_ref[:]                     # (8, w)
    ix = idx_ref[:]                    # (ROWS, 128) in [0, w)
    acc = jnp.zeros_like(ix)
    for r in range(R):
        ixr = (ix + r) % w
        for blk in range(w // 128):
            tb = jnp.broadcast_to(t[:, blk * 128:(blk + 1) * 128][0:1, :], (ROWS, 128))
            g = jnp.take_along_axis(tb, ixr % 128, axis=1)
            acc += jnp.where(ixr // 128 == blk, g, 0)
    o_ref[:] = acc


def lane_gather_direct_kernel(w, tab_ref, idx_ref, o_ref):
    # the direct (ROWS, w) gather — expected to FAIL for w > 128 on Mosaic
    t = jnp.broadcast_to(tab_ref[:][0:1, :], (ROWS, w))
    ix = idx_ref[:]
    acc = jnp.zeros_like(ix)
    for r in range(R):
        acc += jnp.take_along_axis(t, (ix + r) % w, axis=1)[:, :128] * 0 + \
            jnp.take_along_axis(t, (ix + r) % w, axis=1)[:, :128]
    o_ref[:] = acc[:, :128]


def make_gather_bench(w, kern):
    tab = jax.random.randint(key, (8, w), 0, 1 << 30, I32)
    idx = jax.random.randint(jax.random.fold_in(key, 12), (NT * ROWS, 128), 0, w, I32)

    def f(t, ix):
        return pl.pallas_call(
            functools.partial(kern, w),
            grid=(NT,),
            in_specs=[pl.BlockSpec((8, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT * ROWS, 128), I32))(t, ix)
    return f, (tab, idx)


ngathers = NT * ROWS / 8 * R  # number of (8,128)-ish gather rounds
f, args = make_gather_bench(128, lane_gather_kernel)
s = run(f"pallas lane-gather w=128 R={R}", f, *args,
        per=("G probe-lanes/s", lambda s: NT * ROWS * 128 * R / s / 1e9))
f, args = make_gather_bench(512, lane_gather_kernel)
run(f"pallas lane-gather w=512 blk-loop R={R}", f, *args,
    per=("G probe-lanes/s", lambda s: NT * ROWS * 128 * R / s / 1e9))
f, args = make_gather_bench(256, lane_gather_direct_kernel)
run("pallas direct wide gather w=256 (vreg?)", f, *args)


def sublane_gather_kernel(tab_ref, idx_ref, o_ref):
    t = tab_ref[:]        # (8, 128)
    ix = idx_ref[:] % 8   # (ROWS, 128) sublane indices
    acc = jnp.zeros_like(ix)
    for r in range(R):
        acc += jnp.take_along_axis(jnp.broadcast_to(t, (ROWS, 128)) * 0 + 0, ix, axis=0) if False else 0
    # real attempt: gather along axis 0 of the (8,128) table with (ROWS,128) idx
    g = jnp.take_along_axis(t, ix[:8, :] % 8, axis=0)
    o_ref[:] = acc + jnp.broadcast_to(g[0:1], (ROWS, 128))


f, args = make_gather_bench(128, lambda w, t, i, o: sublane_gather_kernel(t, i, o))
run("pallas sublane-gather axis=0 (8,128)", f, *args)


def roll_cmp_kernel(tab_ref, idx_ref, o_ref):
    t = tab_ref[:][0:1, :]  # (1,128)
    q = idx_ref[:]
    acc = jnp.zeros_like(q)
    for r in range(R):
        tr = pltpu.roll(t, -r, 1)
        acc += jnp.where(q == jnp.broadcast_to(tr, q.shape), r, 0)
    o_ref[:] = acc


f, args = make_gather_bench(128, lambda w, t, i, o: roll_cmp_kernel(t, i, o))
run(f"pallas roll+cmp R={R}", f, *args,
    per=("G lanes/s", lambda s: NT * ROWS * 128 * R / s / 1e9))


# dynamic-offset DMA store with SMEM cursor (compacted emit pattern)
def cursor_store_kernel(x_ref, cnt_ref, o_ref, cursor, vbuf, sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cursor[0] = 0

    c = cursor[0]
    vbuf[:] = x_ref[:]
    dma = pltpu.make_async_copy(vbuf, o_ref.at[pl.ds(c, ROWS), :], sem)
    dma.start()
    dma.wait()
    cursor[0] = c + jnp.minimum(cnt_ref[0], ROWS)


def cursor_store(x, cnt):
    return pl.pallas_call(
        cursor_store_kernel, grid=(NT,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((NT * ROWS + ROWS, 128), I32),
        scratch_shapes=[pltpu.SMEM((1,), I32), pltpu.VMEM((ROWS, 128), I32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x, cnt)


cnt = jnp.full((NT,), ROWS // 2, I32)
run("pallas SMEM-cursor dynamic DMA store", cursor_store, x, cnt,
    per=("GB/s", lambda s: 2 * x.size * 4 / s / 1e9))


# masked store
def masked_store_kernel(x_ref, o_ref):
    v = x_ref[:]
    pltpu.store(o_ref, v, mask=(v & 1) == 0)


run("pallas masked store", lambda a: pl.pallas_call(
    masked_store_kernel, grid=(NT,),
    in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NT * ROWS, 128), I32))(a), x)

print()
for k, v in results.items():
    print(f"  {k}: {v}")
