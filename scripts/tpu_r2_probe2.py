"""Round-2 probe set 2: the lane-bucket table forms that avoid every
Mosaic-unsupported gather (cross-vreg / cross-sublane, see
tpu_r2_design.py results: all axis-0 and two-step gathers FAIL).

  1. gather-probe: table [D,128] rows broadcast; query tile (8,128) with
     home-lane plane gathers table[d, lane_q] via axis-1 take_along_axis,
     D static rounds. No query routing needed.
  2. bcast-probe: queries pre-routed to home lane; compare tile against
     each table row broadcast — zero gathers.
  3. PAD mover: shift-network expand inside a kernel + dynamic-offset
     input DMA (sorted rows -> padded per-bucket layout).
  4. XLA transpose [P,128,D] -> [P,D,128] (layout alternative to PAD).
  5. in-kernel log-shift cumsum on (8,128) i32 (needed by fused grouping).
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


NPART = 128            # partitions in the mock
QROWS = 8              # query tile rows

# ---- 1. gather-probe ------------------------------------------------------
def gather_probe_case(D, tiles_per_part):
    # table planes [NPART, D, 128]; query tiles [NPART*tiles, 8, 128]
    def k(tl_ref, th_ref, ql_ref, qh_ref, lane_ref, ocnt_ref, opos_ref):
        ql, qh, lane = ql_ref[0], qh_ref[0], lane_ref[0]
        cnt = jnp.zeros_like(lane)
        pos = jnp.full(lane.shape, -1, I32)
        for d in range(D):
            tl = jnp.broadcast_to(tl_ref[0, d][None, :], lane.shape)
            th = jnp.broadcast_to(th_ref[0, d][None, :], lane.shape)
            gl = jnp.take_along_axis(tl, lane, axis=1)
            gh = jnp.take_along_axis(th, lane, axis=1)
            m = (gl == ql) & (gh == qh)
            cnt += m.astype(I32)
            pos = jnp.where(m & (pos < 0), d, pos)
        ocnt_ref[0] = cnt
        opos_ref[0] = pos

    def make():
        tl = jnp.arange(NPART * D * 128, dtype=I32).reshape(NPART, D, 128)
        th = tl * 7
        nq = NPART * tiles_per_part
        ql = (jnp.arange(nq * 8 * 128, dtype=I32).reshape(nq, 8, 128) * 131) % (D * 128)
        qh = ql * 7
        lane = ql % 128
        grid = (NPART, tiles_per_part)
        tspec = pl.BlockSpec((1, D, 128), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM)
        qspec = pl.BlockSpec((1, 8, 128), lambda p, t: (p * tiles_per_part + t, 0, 0),
                             memory_space=pltpu.VMEM)
        f = pc(k, grid=grid, in_specs=[tspec, tspec, qspec, qspec, qspec],
               out_specs=[qspec, qspec],
               out_shape=[jax.ShapeDtypeStruct((nq, 8, 128), I32)] * 2)
        return f, (tl, th, ql, qh, lane)
    return make


for D in (8, 16, 32):
    n = NPART * 16 * 8 * 128
    run(f"gather-probe D={D} ({n/1e6:.1f}M queries)", gather_probe_case(D, 16),
        per=("G probes/s", lambda s, n=n: n / s / 1e9))


# ---- 2. broadcast-compare probe -------------------------------------------
def bcast_probe_case(D, tiles_per_part):
    def k(tl_ref, th_ref, ql_ref, qh_ref, ocnt_ref, opos_ref):
        ql, qh = ql_ref[0], qh_ref[0]
        cnt = jnp.zeros(ql.shape, I32)
        pos = jnp.full(ql.shape, -1, I32)
        for d in range(D):
            tl = jnp.broadcast_to(tl_ref[0, d][None, :], ql.shape)
            th = jnp.broadcast_to(th_ref[0, d][None, :], ql.shape)
            m = (tl == ql) & (th == qh)
            cnt += m.astype(I32)
            pos = jnp.where(m & (pos < 0), d, pos)
        ocnt_ref[0] = cnt
        opos_ref[0] = pos

    def make():
        tl = jnp.arange(NPART * D * 128, dtype=I32).reshape(NPART, D, 128)
        th = tl * 7
        nq = NPART * tiles_per_part
        ql = (jnp.arange(nq * 8 * 128, dtype=I32).reshape(nq, 8, 128) * 131) % (D * 128)
        qh = ql * 7
        grid = (NPART, tiles_per_part)
        tspec = pl.BlockSpec((1, D, 128), lambda p, t: (p, 0, 0), memory_space=pltpu.VMEM)
        qspec = pl.BlockSpec((1, 8, 128), lambda p, t: (p * tiles_per_part + t, 0, 0),
                             memory_space=pltpu.VMEM)
        f = pc(k, grid=grid, in_specs=[tspec, tspec, qspec, qspec],
               out_specs=[qspec, qspec],
               out_shape=[jax.ShapeDtypeStruct((nq, 8, 128), I32)] * 2)
        return f, (tl, th, ql, qh)
    return make


for D in (8, 16, 32):
    n = NPART * 16 * 8 * 128
    run(f"bcast-probe D={D} ({n/1e6:.1f}M queries)", bcast_probe_case(D, 16),
        per=("G probes/s", lambda s, n=n: n / s / 1e9))


# ---- 3. PAD mover: expand route in-kernel + dyn-offset DMA ----------------
def pad_case(nplanes):
    R, L = 8, 128
    T = R * L          # tile elements
    NT = 512           # output tiles (512*1024 = 524k rows out)

    def k(start_ref, *refs):
        # refs: nplanes input planes (full, ANY), shift (full, ANY),
        #       then nplanes output blocks + occ output
        ins = refs[:nplanes]
        shift_in = refs[nplanes]
        outs = refs[nplanes + 1:nplanes + 1 + nplanes]
        occ_out = refs[nplanes + 1 + nplanes]
        scratch = refs[nplanes + 2 + nplanes:]
        t = pl.program_id(0)
        s0 = start_ref[t]
        n_in = start_ref[t + 1] - s0
        row0 = s0 // L

        copies = []
        for i, (src, dst) in enumerate(zip(list(ins) + [shift_in], scratch)):
            c = pltpu.make_async_copy(
                src.at[pl.ds(row0, 2 * R), :], dst, sem=scratch[-1].at[i])
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

        # local flat offset of the slab start within the 2R-row window
        off = s0 - row0 * L
        flat = jax.lax.broadcasted_iota(I32, (2 * R, L), 0) * L + \
            jax.lax.broadcasted_iota(I32, (2 * R, L), 1)
        k_local = flat - off                       # slab-relative index
        occ = ((k_local >= 0) & (k_local < n_in)).astype(I32)
        sh = scratch[nplanes][:] * occ
        planes = [s[:] for s in scratch[:nplanes]]
        # route expects shift relative to current position; shift plane
        # already holds dest - (tile_base + k_local); add back k offset
        moved, occ2 = route(planes, occ, sh, "expand", mosaic=True)
        for o, m in zip(outs, moved):
            o[0] = m[:R]
        occ_out[0] = occ2[:R]

    def make():
        rng = np.random.default_rng(0)
        n_out = NT * T
        # ~70% fill: n_in rows spread over n_out slots, order-preserving
        n_in = int(n_out * 0.7)
        dest = np.sort(rng.choice(n_out, size=n_in, replace=False))
        starts = np.searchsorted(dest, np.arange(NT + 1) * T).astype(np.int32)
        planes = [jnp.asarray(rng.integers(1, 1 << 30, size=n_in + 2 * T), I32)
                  .reshape(-1, L)[: (n_in + T) // L + R, :]
                  for _ in range(nplanes)]
        # per-element shift relative to its output tile start, stored at
        # the SOURCE position (padded input)
        tile_of = dest // T
        shift_flat = np.zeros(planes[0].size, np.int32)
        kk = np.arange(n_in)
        shift_flat[:n_in] = dest - tile_of * T - (kk - starts[tile_of])
        # shift is indexed slab-relative inside the kernel: rebuild as
        # "shift at source flat position"
        sf = np.zeros(planes[0].size, np.int32)
        sf[:n_in] = shift_flat[:n_in]
        shift = jnp.asarray(sf.reshape(-1, L))
        sspec = [pl.BlockSpec(memory_space=pltpu.ANY)] * (nplanes + 1)
        ospec = [pl.BlockSpec((1, R, L), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)] \
            * (nplanes + 1)
        f = pc(k,
               grid=(NT,),
               in_specs=sspec,
               out_specs=ospec,
               out_shape=[jax.ShapeDtypeStruct((NT, R, L), I32)] * (nplanes + 1),
               scratch_shapes=[pltpu.VMEM((2 * R, L), I32)] * (nplanes + 1)
               + [pltpu.SemaphoreType.DMA((nplanes + 1,))],
               grid_spec=None,
               )
        # scalar prefetch for starts
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(NT,),
            in_specs=sspec, out_specs=ospec,
            scratch_shapes=[pltpu.VMEM((2 * R, L), I32)] * (nplanes + 1)
            + [pltpu.SemaphoreType.DMA((nplanes + 1,))])
        f = pc(k, grid_spec=gs,
               out_shape=[jax.ShapeDtypeStruct((NT, R, L), I32)] * (nplanes + 1))
        return (lambda st, *ps: f(st, *ps)), (jnp.asarray(starts), *planes, shift)
    return make


for npl in (2, 5):
    n_out = 512 * 1024
    run(f"PAD mover nplanes={npl} ({n_out/1e6:.2f}M out slots)", pad_case(npl),
        per=("G rows/s", lambda s, n=n_out: n / s / 1e9))


# ---- 4. XLA transpose [P,128,D] -> [P,D,128] ------------------------------
def transpose_case(P, D):
    def make():
        x = jnp.arange(P * 128 * D, dtype=I32).reshape(P, 128, D)

        def f(x):
            return jnp.swapaxes(x, 1, 2) + 1
        return f, (x,)
    return make


for P, D in ((1024, 16), (1024, 32)):
    n = P * 128 * D
    run(f"XLA transpose [P,128,{D}]->[P,{D},128] ({n/1e6:.1f}M)", transpose_case(P, D),
        per=("G elts/s", lambda s, n=n: n / s / 1e9))


# ---- 5. in-kernel log-shift flat cumsum on (8,128) ------------------------
def cumsum_case():
    from tpq.kernels.shift_network import flat_roll_right

    def k(x_ref, o_ref):
        v = x_ref[0]
        acc = v
        for sh in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512):
            r = flat_roll_right(acc, sh, mosaic=True)
            lane = jax.lax.broadcasted_iota(I32, v.shape, 0) * 128 + \
                jax.lax.broadcasted_iota(I32, v.shape, 1)
            acc = acc + jnp.where(lane >= sh, r, 0)
        o_ref[0] = acc

    def make():
        NT = 1024
        x = jnp.ones((NT, 8, 128), I32)
        spec = pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        f = pc(k, grid=(NT,), in_specs=[spec], out_specs=spec,
               out_shape=jax.ShapeDtypeStruct((NT, 8, 128), I32))
        return f, (x,)

    def check(out):
        row = np.asarray(out[0]).reshape(-1)
        assert row[0] == 1 and row[-1] == 1024, (row[0], row[-1])
    return make, check


mk, ck = cumsum_case()
run("in-kernel log-shift flat cumsum (8,128) x1024", mk,
    per=("G elts/s", lambda s: 1024 * 1024 / s / 1e9), check=ck)
