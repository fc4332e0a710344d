"""Probe set 3: the primitives move.py (PAD/PACK kernels) needs.

  1. dynamic pltpu.roll with a traced (SMEM-scalar) shift, both axes
  2. flat dynamic roll composed from them (lane + conditional sublane)
  3. dyn-offset window READ: make_async_copy(src.at[pl.ds(row0, W)], vmem)
     with row0 from scalar-prefetch values
  4. PACK inner step: in-kernel cumsum + route(pack) + acc merge + DMA
     flush with SMEM cursor (the full sequential-accumulator pattern) at
     (16,128) and (32,128) tile sizes — correctness + rate
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.bench.timing import slope_time
from tpq.kernels.shift_network import route

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
        out = jax.block_until_ready(jax.jit(fn)(*args))
        if check is not None:
            check(out)
        sec, _ = slope_time(jax.jit(fn), args, reps=2)
        extra = f"  ({per[1](sec):9.2f} {per[0]})" if per else ""
        print(f"{name:52s} {sec*1e3:9.4f} ms{extra}", flush=True)
    except Exception as e:
        msg = " | ".join(str(e).split(chr(10))[:2])[:200]
        print(f"{name:52s} FAIL {type(e).__name__}: {msg}", flush=True)


# ---- 1/2: dynamic rolls ----------------------------------------------------
def dyn_roll_case(axis):
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis)

    def make():
        x = jnp.arange(16 * 128, dtype=I32).reshape(16, 128)
        s = jnp.array([5], I32)
        f = pc(k, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                            pl.BlockSpec(memory_space=pltpu.SMEM)],
               out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
               out_shape=jax.ShapeDtypeStruct((16, 128), I32))
        return f, (x, s)

    def check(out):
        want = np.roll(np.arange(16 * 128).reshape(16, 128), 5, axis)
        np.testing.assert_array_equal(np.asarray(out), want)
    return make, check


for ax in (0, 1):
    mk, ck = dyn_roll_case(ax)
    run(f"dyn pltpu.roll axis={ax}", mk, check=ck)


def dyn_flat_roll_case():
    R, L = 16, 128

    def flat_roll_dyn(v, c):
        lane = jax.lax.broadcasted_iota(I32, v.shape, 1)
        rowshift = c // L
        laneshift = c % L
        r = pltpu.roll(v, laneshift, 1)
        r0 = pltpu.roll(r, rowshift, 0)
        r1 = pltpu.roll(r, rowshift + 1, 0)
        return jnp.where(lane < laneshift, r1, r0)

    def k(x_ref, s_ref, o_ref):
        o_ref[:] = flat_roll_dyn(x_ref[:], s_ref[0])

    def make():
        x = jnp.arange(R * L, dtype=I32).reshape(R, L)
        s = jnp.array([300], I32)
        f = pc(k, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                            pl.BlockSpec(memory_space=pltpu.SMEM)],
               out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
               out_shape=jax.ShapeDtypeStruct((R, L), I32))
        return f, (x, s)

    def check(out):
        want = np.roll(np.arange(R * L), 300).reshape(R, L)
        np.testing.assert_array_equal(np.asarray(out), want)
    return make, check


mk, ck = dyn_flat_roll_case()
run("dyn flat roll (lane+cond sublane)", mk, check=ck)


# ---- 3: scalar-prefetch-driven dynamic window read -------------------------
def window_read_case():
    R, L = 16, 128
    NT = 64

    def k(start_ref, x_hbm, o_ref, vbuf, sem):
        t = pl.program_id(0)
        row0 = start_ref[t] // L
        copy = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, R), :], vbuf, sem)
        copy.start()
        copy.wait()
        o_ref[0] = vbuf[:]

    def make():
        x = jnp.arange((NT * R + R) * L, dtype=I32).reshape(-1, L)
        starts = jnp.asarray(np.arange(NT) * R * L + 128 * (np.arange(NT) % 3),
                             I32)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(NT,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, R, L), lambda t, s: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, L), I32), pltpu.SemaphoreType.DMA])
        f = pc(k, grid_spec=gs,
               out_shape=jax.ShapeDtypeStruct((NT, R, L), I32))
        return f, (starts, x)

    def check(out):
        o = np.asarray(out)
        x = np.arange((NT * R + R) * 128).reshape(-1, 128)
        for t in (0, 1, 5):
            row0 = (t * R * 128 + 128 * (t % 3)) // 128
            np.testing.assert_array_equal(o[t], x[row0:row0 + R])
    return make, check


mk, ck = window_read_case()
run("scalar-prefetch dyn window read", mk, check=ck,
    per=("GB/s", lambda s: 64 * 16 * 128 * 4 * 2 / s / 1e9))


# ---- 4: full PACK pattern ---------------------------------------------------
def pack_case(R, nplanes, NT):
    L = 128
    T = R * L

    def flat_roll_dyn(v, c):
        lane = jax.lax.broadcasted_iota(I32, v.shape, 1)
        rowshift = c // L
        laneshift = c % L
        r = pltpu.roll(v, laneshift, 1)
        r0 = pltpu.roll(r, rowshift, 0)
        r1 = pltpu.roll(r, rowshift + 1, 0)
        return jnp.where(lane < laneshift, r1, r0)

    def flat_cumsum_excl(v):
        # inclusive log-shift cumsum then subtract
        acc = v
        flat = jax.lax.broadcasted_iota(I32, v.shape, 0) * L + \
            jax.lax.broadcasted_iota(I32, v.shape, 1)
        sh = 1
        while sh < v.shape[0] * L:
            from tpq.kernels.shift_network import flat_roll_right
            r = flat_roll_right(acc, sh, mosaic=True)
            acc = acc + jnp.where(flat >= sh, r, 0)
            sh *= 2
        return acc - v

    def k(occ_ref, *refs):
        ins = refs[:nplanes]
        outs = refs[nplanes:2 * nplanes]
        cur, accs, sem = refs[2 * nplanes], refs[2 * nplanes + 1], refs[2 * nplanes + 2]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            cur[0] = 0   # flushed full rows
            cur[1] = 0   # partial length
            accs[:] = jnp.zeros_like(accs)

        occ = occ_ref[0]
        flat = jax.lax.broadcasted_iota(I32, occ.shape, 0) * L + \
            jax.lax.broadcasted_iota(I32, occ.shape, 1)
        rank = flat_cumsum_excl(occ)
        cnt = jnp.sum(occ)
        shift = (flat - rank) * occ
        planes = [r[0] for r in ins]
        moved, _ = route(planes, occ, shift, "pack", mosaic=True)

        alen = cur[1]
        total_now = alen + cnt
        full = total_now // L
        for i in range(nplanes):
            # place packed at offset alen within an (R+1,L) window; row R
            # stays zero before the roll so wrap cannot collide
            buf = jnp.concatenate([moved[i], jnp.zeros((1, L), I32)], axis=0)
            buf = flat_roll_dyn(buf, alen)
            carry = accs[i * (R + 1), :][None, :]
            buf = buf.at[0:1, :].add(carry) if False else \
                jnp.concatenate([buf[0:1] + carry, buf[1:]], axis=0)
            accs[i * (R + 1):(i + 1) * (R + 1), :] = buf
        # flush R+1 rows per plane at row cursor (over-write trick)
        c = cur[0]
        for i in range(nplanes):
            dma = pltpu.make_async_copy(
                accs.at[pl.ds(i * (R + 1), R + 1), :],
                outs[i].at[pl.ds(c, R + 1), :], sem)
            dma.start()
            dma.wait()
        # keep only the partial row: roll left by full rows, zero the rest
        newlen = total_now - full * L
        for i in range(nplanes):
            w = accs[i * (R + 1):(i + 1) * (R + 1), :]
            w = pltpu.roll(w, (R + 1) - full, 0)  # roll rows left by `full`
            lanei = jax.lax.broadcasted_iota(I32, w.shape, 1)
            rowi = jax.lax.broadcasted_iota(I32, w.shape, 0)
            keep = (rowi == 0) & (lanei < newlen)
            accs[i * (R + 1):(i + 1) * (R + 1), :] = jnp.where(keep, w, 0)
        cur[0] = c + full
        cur[1] = newlen

    def make():
        rng = np.random.default_rng(0)
        occ = (rng.random((NT, R, L)) < 0.6).astype(np.int32)
        planes = [(rng.integers(1, 1 << 30, size=(NT, R, L))).astype(np.int32)
                  for _ in range(nplanes)]
        ospec = pl.BlockSpec((1, R, L), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        f = pc(k, grid=(NT,),
               in_specs=[ospec] + [ospec] * nplanes,
               out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * nplanes,
               out_shape=[jax.ShapeDtypeStruct((NT * R + R + 1, L), I32)] * nplanes,
               scratch_shapes=[pltpu.SMEM((2,), I32),
                               pltpu.VMEM((nplanes * (R + 1), L), I32),
                               pltpu.SemaphoreType.DMA],
               compiler_params=pltpu.CompilerParams(has_side_effects=True))

        def g(occ, *ps):
            return f(occ, *ps)
        state = {"occ": occ, "planes": planes}

        def check(out):
            o0 = np.asarray(out[0]).reshape(-1)
            occf = state["occ"].reshape(-1).astype(bool)
            want = state["planes"][0].reshape(-1)[occf]
            np.testing.assert_array_equal(o0[:len(want)], want)
            # rows beyond the final flush are never written (ANY output);
            # only the flushed zero-tail is guaranteed
            flushed_end = (len(want) // L + R) * L
            assert (o0[len(want):flushed_end] == 0).all()
        make.check = check
        return g, (jnp.asarray(occ), *[jnp.asarray(p) for p in planes])
    return make


for R, npl in ((16, 2), (16, 6), (32, 6)):
    NT = (1 << 20) // (R * 128)
    mk = pack_case(R, npl, NT)
    run(f"PACK R={R} nplanes={npl} (1M rows)", mk,
        per=("G rows/s", lambda s: (1 << 20) / s / 1e9),
        check=lambda out, mk=mk: mk.check(out))
