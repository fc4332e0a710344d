"""Throughput of the Pallas primitives the bucketed-RH join is built from.
All forms verified compiling in tpu_r2_pallas_forms.py.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.bench.timing import slope_time

I32 = jnp.int32

def pc(*args, **kw):
    """pc traced with x64 disabled (gridded Mosaic lowering breaks
    under x64: index_map scalars become i64 — measured on this box)."""
    inner = pl.pallas_call(*args, **kw)

    def call(*ops):
        with jax.enable_x64(False):
            return inner(*ops)
    return call



def run(name, fn, args, per=None):
    try:
        sec, _ = slope_time(jax.jit(fn), args, reps=2)
        extra = f"  ({per[1](sec):8.2f} {per[0]})" if per else ""
        print(f"{name:46s} {sec*1e3:9.4f} ms{extra}", flush=True)
        return sec
    except Exception:
        print(f"{name:46s} FAIL", flush=True)
        traceback.print_exc(limit=3)
        return None


NT = 1024
ROWS = 64  # (ROWS,128) per grid step


def vspec(rows=ROWS):
    return pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)


x = jnp.zeros((NT * ROWS, 128), I32)
nbytes = x.size * 4


# 1. stream
def stream_k(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


run("stream 32MiB r+w", lambda a: pc(
    stream_k, grid=(NT,), in_specs=[vspec()], out_specs=vspec(),
    out_shape=jax.ShapeDtypeStruct(x.shape, I32))(a), (x,),
    per=("GB/s", lambda s: 2 * nbytes / s / 1e9))

# 2. gather rounds: D rounds x P planes of aligned (ROWS,128) take_along_axis
for D, P in ((8, 2), (16, 2), (16, 4)):
    def gk(t_ref, i_ref, o_ref, D=D, P=P):
        ix = i_ref[:]
        acc = jnp.zeros_like(ix)
        planes = [t_ref[:] + p for p in range(P)]
        for d in range(D):
            ixd = (ix + d) % 128
            for p in range(P):
                acc += jnp.take_along_axis(planes[p], ixd, axis=1)
        o_ref[:] = acc

    ix = (jnp.arange(NT * ROWS * 128, dtype=I32).reshape(NT * ROWS, 128) * 2654435761) % 128
    run(f"gather-walk D={D} P={P}", lambda t, i, gk=gk: pc(
        gk, grid=(NT,), in_specs=[vspec(), vspec()], out_specs=vspec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, I32))(t, i), (x, ix),
        per=("G probes/s", lambda s: NT * ROWS * 128 / s / 1e9))


# 3. realistic probe round: 2-plane key compare + walk + final payload fetch
def probe_round_k(D, tl_ref, th_ref, ql_ref, qh_ref, hm_ref, o_ref):
    tl, th = tl_ref[:], th_ref[:]
    ql, qh, hm = ql_ref[:], qh_ref[:], hm_ref[:]
    pos = jnp.full(ql.shape, -1, I32)
    for d in range(D):
        ix = (hm + d) % 128
        kl = jnp.take_along_axis(tl, ix, axis=1)
        kh = jnp.take_along_axis(th, ix, axis=1)
        m = (kl == ql) & (kh == qh) & (pos < 0)
        pos = jnp.where(m, ix, pos)
    o_ref[:] = pos


for D in (8, 16):
    ix = (jnp.arange(NT * ROWS * 128, dtype=I32).reshape(NT * ROWS, 128) * 2654435761) % 112
    run(f"probe-walk keys D={D}", lambda *a, D=D: pc(
        functools.partial(probe_round_k, D), grid=(NT,),
        in_specs=[vspec()] * 5, out_specs=vspec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, I32))(*a),
        (x, x, x, x, ix),
        per=("G probes/s", lambda s: NT * ROWS * 128 / s / 1e9))


# 4. per-bucket window DMA read: 64 DMAs of (1?,...) — use 8-sublane windows:
# grid over bucket groups of 8; DMA (8,128)-row window per bucket? Model the
# actual plan: per grid step, ONE DMA of a (ROWS,128) dynamic window.
def win_k(starts_ref, hbm_ref, o_ref, vbuf, sem):
    g = pl.program_id(0)
    st = starts_ref[g]
    dma = pltpu.make_async_copy(hbm_ref.at[pl.ds(st, ROWS), :], vbuf, sem)
    dma.start()
    dma.wait()
    o_ref[:] = vbuf[:] + 1


starts = (jnp.arange(NT, dtype=I32) * 7919) % (NT * ROWS - ROWS)
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(NT,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((ROWS, 128), lambda g, s: (g, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((ROWS, 128), I32), pltpu.SemaphoreType.DMA])
run("dyn-window DMA read (64,128) blocks", lambda s, a: pc(
    win_k, grid_spec=gs, out_shape=jax.ShapeDtypeStruct(x.shape, I32))(s, a),
    (starts, x), per=("GB/s", lambda s: 2 * nbytes / s / 1e9))


# 4b. small per-bucket windows: 8 DMAs of (8,128) per grid step (double-buffered not attempted)
def win8_k(starts_ref, hbm_ref, o_ref, vbuf, sems):
    g = pl.program_id(0)
    for j in range(8):
        st = starts_ref[g * 8 + j]
        pltpu.make_async_copy(hbm_ref.at[pl.ds(st, 8), :], vbuf.at[j], sems.at[j]).start()
    for j in range(8):
        pltpu.make_async_copy(hbm_ref.at[pl.ds(starts_ref[g * 8 + j], 8), :],
                              vbuf.at[j], sems.at[j]).wait()
    o_ref[:] = vbuf[:].reshape(ROWS, 128) + 1


starts8 = (jnp.arange(NT * 8, dtype=I32) * 7919) % (NT * ROWS - 8)
gs8 = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(NT,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((ROWS, 128), lambda g, s: (g, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((8, 8, 128), I32), pltpu.SemaphoreType.DMA((8,))])
run("dyn-window DMA read 8x(8,128) per step", lambda s, a: pc(
    win8_k, grid_spec=gs8, out_shape=jax.ShapeDtypeStruct(x.shape, I32))(s, a),
    (starts8, x), per=("GB/s", lambda s: 2 * nbytes / s / 1e9))


# 5. cursor-DMA write stream (compacted emit): one (ROWS,128) DMA per step
def emit_k(x_ref, n_ref, o_ref, cur, vbuf, sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cur[0] = 0
    c = cur[0]
    vbuf[:] = x_ref[:] + 1
    dma = pltpu.make_async_copy(vbuf, o_ref.at[pl.ds(c, ROWS), :], sem)
    dma.start()
    dma.wait()
    cur[0] = c + n_ref[i]


cnt = jnp.full((NT,), ROWS - 8, I32)
run("cursor-DMA emit (64,128) blocks", lambda a, n: pc(
    emit_k, grid=(NT,),
    in_specs=[vspec(), pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((NT * ROWS + ROWS, 128), I32),
    scratch_shapes=[pltpu.SMEM((1,), I32), pltpu.VMEM((ROWS, 128), I32),
                    pltpu.SemaphoreType.DMA],
    compiler_params=pltpu.CompilerParams(has_side_effects=True))(a, n),
    (x, cnt), per=("GB/s", lambda s: 2 * nbytes / s / 1e9))


# 6. in-kernel pack: per-row lane compaction via 7-round binary search
def pack_k(x_ref, o_ref):
    v = x_ref[:]
    keep = (v & 3) != 3  # ~75% kept
    lane = jax.lax.broadcasted_iota(I32, v.shape, 1)
    c = keep.astype(I32)
    for sh in (1, 2, 4, 8, 16, 32, 64):
        c = c + jnp.where(lane >= sh, pltpu.roll(c, sh, 1), 0)  # inclusive cumsum
    # j(t) = first lane with c[j] == t+1 and keep: binary search over sorted c
    tgt = lane + 1
    lo = jnp.zeros_like(lane)
    for step in (64, 32, 16, 8, 4, 2, 1):
        mid = lo + step
        cm = jnp.take_along_axis(c, jnp.minimum(mid, 127), axis=1)
        lo = jnp.where((cm < tgt) & (mid < 128), mid, lo)
    # fix: lo points at last lane with c < tgt => j = lo+ (c[lo]<tgt)
    c0 = jnp.take_along_axis(c, lo, axis=1)
    j = jnp.where(c0 < tgt, jnp.minimum(lo + 1, 127), lo)
    o_ref[:] = jnp.take_along_axis(v, j, axis=1)


run("pack per-row (cumsum+binsearch+gather)", lambda a: pc(
    pack_k, grid=(NT,), in_specs=[vspec()], out_specs=vspec(),
    out_shape=jax.ShapeDtypeStruct(x.shape, I32))(a), (x,),
    per=("GB/s", lambda s: 2 * nbytes / s / 1e9))

# 7. dynamic roll throughput
def droll_k(x_ref, s_ref, o_ref):
    v = x_ref[:]
    for j in range(8):
        v = pltpu.roll(v, s_ref[j], 1)
    o_ref[:] = v


sh = jnp.arange(8, dtype=I32) + 1
run("dynamic roll x8 per tile", lambda a, s: pc(
    droll_k, grid=(NT,),
    in_specs=[vspec(), pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=vspec(),
    out_shape=jax.ShapeDtypeStruct(x.shape, I32))(a, s), (x, sh),
    per=("GB/s", lambda s: 2 * nbytes / s / 1e9))
