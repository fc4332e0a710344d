"""Round-4 design probes (VERDICT r3 items 1-3): what sets the per-step
latency of the sequential-grid cursor kernels (the fused emit's 3.4 us/tile
floor), and which gather/DMA forms the walk rework can use.

Cases (each isolated, slope-timed):
  A. cursor-kernel step latency: grid of T steps over (rows,128) tiles,
     per-step in-register pack route + accumulator merge + flush DMA:
       a1 sync flush (start+wait every step)      [r3 fused-kernel shape]
       a2 async flush (wait previous step's DMA)  [double-buffered staging]
       a3 no flush (pure route+merge compute)
       a4 async + braided flush (all planes in ONE DMA)
     at rows = 8 / 16 / 32, nplanes = 6.
  B. walk forms: D-round lane gather on (8,128) vs (32,128) tiles; and the
     pltpu.repeat sublane-broadcast form (table block (G,128) repeated to
     (rows,128)) that walks G partitions per step.
  C. gather re-probe on the current stack: take_along_axis axis=0 across
     sublanes (forbidden per r2 — re-verify), 2-step 2D gather.
  D. lax.sort scaling, 1-key composite + 4 operands: 1M/2M/4M/8M
     (config-2 planning: where does the superlinear break make chunked
     sort + ladder win?).
  E. per-partition-count histogram via in-kernel chunked compare (64 bins
     over a (32,128) tile) — the exact-bases building block.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.bench.timing import slope_time

GROUPS = set(sys.argv[1:]) or set("ABCDE")

I32 = jnp.int32
L = 128


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
            check(jax.tree_util.tree_map(np.asarray, out))
        sec, _ = slope_time(jax.jit(fn), args, reps=2)
        extra = f"  ({per[1](sec):9.3f} {per[0]})" if per else ""
        print(f"{name:52s} {sec*1e3:9.4f} ms{extra}", flush=True)
        return sec
    except Exception as e:
        msg = " | ".join(str(e).split(chr(10))[:2])[:200]
        print(f"{name:52s} FAIL {type(e).__name__}: {msg}", flush=True)
        return None


# ---------------------------------------------------------------------------
# A. cursor-kernel step latency
# ---------------------------------------------------------------------------
N = 1 << 21      # elements (2M ~ the r3 probe universe)
NP = 6           # planes (nout of the fused emit at config-1)


def cursor_case(rows: int, mode: str):
    """mode: sync | async | nodma | braid"""
    from tpq.kernels.move import _flat_cumsum_excl, _flat_roll_dyn
    from tpq.kernels.shift_network import route

    T = rows * L
    ntiles = N // T
    F = rows            # flush rows per step (arrivals <= 1 tile)
    W = 2 * F

    def kern(*refs):
        ins = refs[:NP]
        outs = refs[NP:2 * NP]
        acc = refs[2 * NP]
        stage = refs[2 * NP + 1]
        cur = refs[2 * NP + 2]
        sem = refs[2 * NP + 3]
        t = pl.program_id(0)
        last = t == pl.num_programs(0) - 1

        @pl.when(t == 0)
        def _():
            cur[0] = 0
            cur[1] = 0
            cur[2] = 0
            cur[3] = 0
            acc[:] = jnp.zeros_like(acc)

        planes = [r[0] for r in ins]
        # emit-like occupancy ~63% (first-match density): occ from data
        occ = (planes[0] & 3) != 3
        occ = occ.astype(I32)
        flat = (jax.lax.broadcasted_iota(I32, occ.shape, 0) * L
                + jax.lax.broadcasted_iota(I32, occ.shape, 1))
        rank = _flat_cumsum_excl(occ, True)
        shift = (flat - rank) * occ
        moved, _ = route(planes, occ, shift, "pack", mosaic=True)
        cnt = jnp.sum(occ.astype(jnp.float32)).astype(I32)

        c, alen = cur[0], cur[1]
        total_now = alen + cnt
        zpad = jnp.zeros((W - rows, L), I32)
        for i in range(NP):
            buf = jnp.concatenate([moved[i], zpad], axis=0)
            buf = _flat_roll_dyn(buf, alen, True)
            acc[i * W:(i + 1) * W, :] = acc[i * W:(i + 1) * W, :] + buf
        full = total_now >= F * L

        if mode == "nodma":
            @pl.when(full)
            def _():
                rowi = jax.lax.broadcasted_iota(I32, (W, L), 0)
                for i in range(NP):
                    w = pltpu.roll(acc[i * W:(i + 1) * W, :], W - F, 0)
                    acc[i * W:(i + 1) * W, :] = jnp.where(rowi < W - F, w, 0)
                cur[0] = c + F
                cur[1] = total_now - F * L

            @pl.when(~full)
            def _():
                cur[1] = total_now

            @pl.when(last)
            def _():
                copies = []
                for i in range(NP):
                    d = pltpu.make_async_copy(
                        acc.at[pl.ds(i * W, F), :],
                        outs[i].at[pl.ds(0, F), :], sem.at[i])
                    d.start()
                    copies.append(d)
                for d in copies:
                    d.wait()
            return

        if mode == "sync":
            @pl.when(full)
            def _():
                copies = []
                for i in range(NP):
                    d = pltpu.make_async_copy(
                        acc.at[pl.ds(i * W, F), :],
                        outs[i].at[pl.ds(c, F), :], sem.at[i])
                    d.start()
                    copies.append(d)
                for d in copies:
                    d.wait()
                rowi = jax.lax.broadcasted_iota(I32, (W, L), 0)
                for i in range(NP):
                    w = pltpu.roll(acc[i * W:(i + 1) * W, :], W - F, 0)
                    acc[i * W:(i + 1) * W, :] = jnp.where(rowi < W - F, w, 0)
                cur[0] = c + F
                cur[1] = total_now - F * L

            @pl.when(~full)
            def _():
                cur[1] = total_now

            @pl.when(last)
            def _():
                copies = []
                for i in range(NP):
                    d = pltpu.make_async_copy(
                        acc.at[pl.ds(i * W, F), :],
                        outs[i].at[pl.ds(jnp.minimum(cur[0], ntiles * rows), F), :],
                        sem.at[i])
                    d.start()
                    copies.append(d)
                for d in copies:
                    d.wait()
            return

        # async / braid: copy flush window to staging, start DMA, wait for
        # the PREVIOUS flush's DMA only (cur[2]=pending flag, cur[3]=its row)
        def wait_prev():
            pc_ = cur[3]
            if mode == "braid":
                pltpu.make_async_copy(
                    stage, outs[0].at[pl.ds(pc_ * NP, NP * F), :],
                    sem.at[0]).wait()
            else:
                for i in range(NP):
                    pltpu.make_async_copy(
                        stage.at[pl.ds(i * F, F), :],
                        outs[i].at[pl.ds(pc_, F), :], sem.at[i]).wait()

        @pl.when(full)
        def _():
            # retire previous in-flight DMA before reusing staging
            @pl.when(cur[2] > 0)
            def _():
                wait_prev()
            for i in range(NP):
                stage[i * F:(i + 1) * F, :] = acc[i * W:i * W + F, :]
            if mode == "braid":
                d = pltpu.make_async_copy(
                    stage, outs[0].at[pl.ds(c * NP, NP * F), :], sem.at[0])
                d.start()
            else:
                for i in range(NP):
                    d = pltpu.make_async_copy(
                        stage.at[pl.ds(i * F, F), :],
                        outs[i].at[pl.ds(c, F), :], sem.at[i])
                    d.start()
            cur[2] = 1
            cur[3] = c
            rowi = jax.lax.broadcasted_iota(I32, (W, L), 0)
            for i in range(NP):
                w = pltpu.roll(acc[i * W:(i + 1) * W, :], W - F, 0)
                acc[i * W:(i + 1) * W, :] = jnp.where(rowi < W - F, w, 0)
            cur[0] = c + F
            cur[1] = total_now - F * L

        @pl.when(~full)
        def _():
            cur[1] = total_now

        @pl.when(last)
        def _():
            @pl.when(cur[2] > 0)
            def _():
                wait_prev()

    def make():
        xs = [(jnp.arange(N, dtype=I32) * (2654435761 + i)).reshape(
            ntiles, rows, L) for i in range(NP)]
        out_rows = ntiles * rows + W
        if mode == "braid":
            out_shapes = [jax.ShapeDtypeStruct((out_rows * NP, L), I32)] \
                + [jax.ShapeDtypeStruct((8, L), I32)] * (NP - 1)
        else:
            out_shapes = [jax.ShapeDtypeStruct((out_rows, L), I32)] * NP
        f = pc(
            kern, grid=(ntiles,),
            in_specs=[pl.BlockSpec((1, rows, L), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)] * NP,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * NP,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((NP * W, L), I32),
                            pltpu.VMEM((NP * F, L), I32),
                            pltpu.SMEM((4,), I32),
                            pltpu.SemaphoreType.DMA((NP,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True))
        return f, tuple(xs)
    return make


if "A" in GROUPS:
    for rows in (8, 16, 32):
        T = rows * L
        for mode in ("nodma", "sync", "async", "braid"):
            run(f"A cursor rows={rows:2d} {mode:5s} ({N//T} steps)",
                cursor_case(rows, mode),
                per=("us/step", lambda s, t=T: s / (N // t) * 1e6))


# ---------------------------------------------------------------------------
# B. walk forms
# ---------------------------------------------------------------------------
def walk_case(rows: int, D: int, G: int = 1, npl: int = 3):
    """D-round gather walk; G>1 uses a (G*D,128) table block repeated to
    (rows,128) per round (rows//G query rows per partition row)."""
    ntiles = N // (rows * L)

    def kern(t_ref, q_ref, lane_ref, o_ref):
        lane_v = lane_ref[0]
        q = q_ref[0]
        cnt = jnp.zeros((rows, L), I32)
        rep = rows // G
        for d in range(D):
            for p in range(npl):
                row = t_ref[(d * npl + p) * G:(d * npl + p) * G + G, :]
                if G == 1:
                    tb = jnp.broadcast_to(row, (rows, L))
                else:
                    tb = pltpu.repeat(row, rep, axis=0)
                g = jnp.take_along_axis(tb, lane_v, axis=1)
                cnt = cnt + (g == q).astype(I32)
        o_ref[0] = cnt

    def make():
        tbl = (jnp.arange(D * npl * G * L, dtype=I32)).reshape(D * npl * G, L)
        q = (jnp.arange(N, dtype=I32) * 2654435761).reshape(ntiles, rows, L)
        lane = ((jnp.arange(N, dtype=I32) * 40503) % L).reshape(ntiles, rows, L)
        f = pc(
            kern, grid=(ntiles,),
            in_specs=[pl.BlockSpec((D * npl * G, L), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, rows, L), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, rows, L), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows, L), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntiles, rows, L), I32))
        return f, (tbl, q, lane)
    return make


if "B" in GROUPS:
    for rows, D, G in ((8, 40, 1), (16, 40, 1), (32, 40, 1), (32, 16, 1),
                       (32, 40, 4), (32, 16, 4)):
        run(f"B walk rows={rows:2d} D={D} G={G}", walk_case(rows, D, G),
            per=("G gath/s", lambda s, d=D: 3 * d * N / s / 1e9))


# ---------------------------------------------------------------------------
# C. gather re-probe (r2 said these fail — confirm on current stack)
# ---------------------------------------------------------------------------
def axis0_case(Nrows):
    def k(t_ref, i_ref, o_ref):
        t = t_ref[:]
        o_ref[:] = jnp.take_along_axis(t, i_ref[:] % Nrows, axis=0)[:32]

    def make():
        t = jnp.arange(Nrows * 128, dtype=I32).reshape(Nrows, 128)
        ix = (jnp.arange(64 * 32 * 128, dtype=I32).reshape(64 * 32, 128)
              * 2654435761) % Nrows
        f = pc(k, grid=(64,),
               in_specs=[pl.BlockSpec((Nrows, 128), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((32, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)],
               out_specs=pl.BlockSpec((32, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM),
               out_shape=jax.ShapeDtypeStruct((64 * 32, 128), I32))
        return f, (t, ix)
    return make


if "C" in GROUPS:
    for Nr in (32, 512):
        run(f"C axis0 cross-sublane gather N={Nr}", axis0_case(Nr),
            per=("G gath/s", lambda s: 64 * 32 * 128 / s / 1e9))


# ---------------------------------------------------------------------------
# D. lax.sort scaling (1-key i64 composite + 4 i32 operands)
# ---------------------------------------------------------------------------
def sort_case(n):
    def make():
        k = (np.random.default_rng(1).integers(0, 1 << 62, n)).astype(np.int64)
        ops = [jnp.asarray((np.arange(n) * (i + 1)) % (1 << 31), dtype=jnp.int32)
               for i in range(4)]

        def f(k, *ops):
            res = jax.lax.sort((k, *ops), num_keys=1, is_stable=True)
            return res[0]
        return f, (jnp.asarray(k), *ops)
    return make


if "D" in GROUPS:
    for n in (1 << 20, 1 << 21, 1 << 22, 1 << 23):
        run(f"D lax.sort 1key+4ops n={n>>20}M", sort_case(n),
            per=("ms/M", lambda s, m=n: s * 1e3 / (m / 1e6)))


# ---------------------------------------------------------------------------
# E. in-kernel 64-bin histogram of a (32,128) tile (chunked compare)
# ---------------------------------------------------------------------------
def hist_case():
    rows, B = 32, 64
    ntiles = N // (rows * L)

    def kern(x_ref, o_ref):
        x = x_ref[0] & (B - 1)
        # bins along lanes: compare against iota, f32 row-sum
        binv = jax.lax.broadcasted_iota(I32, (8, L), 1) % B
        acc = jnp.zeros((8, L), jnp.float32)
        for r in range(0, rows, 8):
            blk = x[r:r + 8]
            for b8 in range(8):
                row = blk[b8:b8 + 1, :]  # (1,128)
                eq = (jnp.broadcast_to(row.T[:B], (B, 8)).T * 0)  # placeholder
            acc = acc  # fallback: simplest form below
        # simplest: one-hot accumulate over 64 shifted compares
        h = jnp.zeros((8, L), jnp.float32)
        for b in range(B):
            h = h.at[b // 16, (b % 16) * 8].add(
                jnp.sum((x == b).astype(jnp.float32)))
        o_ref[0] = h.astype(I32)

    def make():
        x = (jnp.arange(N, dtype=I32) * 2654435761).reshape(ntiles, rows, L)
        f = pc(kern, grid=(ntiles,),
               in_specs=[pl.BlockSpec((1, rows, L), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM)],
               out_specs=pl.BlockSpec((1, 8, L), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM),
               out_shape=jax.ShapeDtypeStruct((ntiles, 8, L), I32))
        return f, (x,)
    return make


if "E" in GROUPS:
    run("E in-kernel 64-bin tile histogram", hist_case(),
        per=("us/tile", lambda s: s / (N // (32 * L)) * 1e6))
