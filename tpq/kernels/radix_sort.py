"""C5 — LSD radix sort for the merge path (SURVEY.md §2.1 C5;
BASELINE.json:L5 "radix sort for the merge path"; oracle twin:
oracle/radix_sort.h).

Two engines, choice measurement-driven (SURVEY.md §7.3.4):

  * `lsd_radix_sort` — the Pallas LSD radix sort (VERDICT r2 item 5):
    one bit per pass, each pass a single sequential-grid kernel with
    TWO fused pack streams (zeros and ones), each front-compacted
    in-register by the monotone shift network and flushed to its own
    buffer by dynamic-offset DMA with a cursor; the host splices the
    ones buffer at offset n0 = #zeros (one where + dynamic roll). ONE
    kernel compilation serves every pass (the per-pass bit is an
    input) — unlike the multi-operand `lax.sort`, whose XLA:TPU
    compile measured 645 s at config-1 shape. Cost is O(key_bits)
    passes at ~HBM rate; `key_bits` bounds the sorted domain (the
    reference's LSD loop is byte-per-pass over fixed u64 width,
    oracle/radix_sort.h — same idea, TPU-shaped radix 2).

  * `sort_rows` — one stable multi-operand `lax.sort`. Faster per call
    at benchmark shapes on v5e (~3.2 ms/1M x 5 operands vs the radix
    engine's ~0.4 ms/bit-pass), but with pathological compile time and
    superlinear scaling; kept as the default engine with the measured
    comparison recorded in BENCH/BASELINE notes.

`msd_partition` stays available for ordered partitioning (contiguous
key ranges for the distributed merge path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.columnar import Table
from tpq.kernels.radix_partition import partition_padded

I32 = jnp.int32
I64_MIN = jnp.iinfo(jnp.int64).min
L = 128
_F = 32          # rows per flush DMA
_W = 2 * _F      # accumulator window rows per stream per plane


def _split1_kernel(nplanes: int, rows: int, out_row_limit: int, mosaic: bool,
                   *refs):
    """One stable 1-bit split pass (see module docstring): two fused
    pack streams — zeros to the A outputs, ones to the B outputs, each
    front-compacted with its own cursor; the host splices B at offset
    n0. refs: bit plane + nplanes data planes (VMEM (1, rows, L) tiles),
    2*nplanes outputs (ANY), scratch: accA, accB (VMEM (nplanes*_W, L)),
    cur (SMEM 4: cA_rows, alenA, cB_rows, alenB), DMA sems (2*nplanes)."""
    from tpq.kernels.move import _flat_cumsum_excl, _flat_roll_dyn
    from tpq.kernels.shift_network import route

    bit_ref = refs[0]
    ins = refs[1:1 + nplanes]
    outsA = refs[1 + nplanes:1 + 2 * nplanes]
    outsB = refs[1 + 2 * nplanes:1 + 3 * nplanes]
    accA = refs[1 + 3 * nplanes]
    accB = refs[2 + 3 * nplanes]
    cur = refs[3 + 3 * nplanes]
    sem = refs[4 + 3 * nplanes]

    t = pl.program_id(0)
    last = t == pl.num_programs(0) - 1

    @pl.when(t == 0)
    def _():
        for i in range(4):
            cur[i] = 0
        accA[:] = jnp.zeros_like(accA)
        accB[:] = jnp.zeros_like(accB)

    bit = bit_ref[0]
    planes = [r[0] for r in ins]
    occ0 = (bit == 0).astype(I32)
    flat = (jax.lax.broadcasted_iota(I32, bit.shape, 0) * L
            + jax.lax.broadcasted_iota(I32, bit.shape, 1))

    zpad = jnp.zeros((_W - rows, L), I32)

    def stream(occ, acc, outs, cur_rows, cur_alen, sem_base):
        rank = _flat_cumsum_excl(occ, mosaic)
        shift = (flat - rank) * occ
        mv, _ = route(planes, occ, shift, "pack", mosaic=mosaic)
        # Mosaic lowers int reductions via an unsupported i64 proxy on
        # v5e; f32 is exact for tile counts < 2^24
        cnt = jnp.sum(occ.astype(jnp.float32)).astype(I32)
        c, alen = cur[cur_rows], cur[cur_alen]
        total_now = alen + cnt
        for i in range(nplanes):
            buf = jnp.concatenate([mv[i], zpad], axis=0)
            buf = _flat_roll_dyn(buf, alen, mosaic)  # no wrap: < _W*L
            acc[i * _W:(i + 1) * _W, :] = acc[i * _W:(i + 1) * _W, :] + buf
        full = total_now >= _F * L

        def flush(row0):
            copies = []
            for i in range(nplanes):
                dma = pltpu.make_async_copy(
                    acc.at[pl.ds(i * _W, _F), :],
                    outs[i].at[pl.ds(jnp.minimum(row0, out_row_limit), _F), :],
                    sem.at[sem_base + i])
                dma.start()
                copies.append(dma)
            for dma in copies:
                dma.wait()

        @pl.when(full)
        def _():
            flush(c)
            rowi = jax.lax.broadcasted_iota(I32, (_W, L), 0)
            for i in range(nplanes):
                w = acc[i * _W:(i + 1) * _W, :]
                if mosaic:
                    w = pltpu.roll(w, _W - _F, 0)
                else:
                    w = jnp.roll(w, _W - _F, 0)
                acc[i * _W:(i + 1) * _W, :] = jnp.where(rowi < _W - _F, w, 0)
            cur[cur_rows] = c + _F
            cur[cur_alen] = total_now - _F * L

        @pl.when(~full)
        def _():
            cur[cur_alen] = total_now

        @pl.when(last)
        def _():
            flush(cur[cur_rows])  # drain the carry (post-update cursor)

    stream(occ0, accA, outsA, 0, 1, 0)
    stream(1 - occ0, accB, outsB, 2, 3, nplanes)


def _split1(planes: list[jnp.ndarray], bit: jnp.ndarray, n0: jnp.ndarray,
            rows: int = 32, interpret: bool = False) -> list[jnp.ndarray]:
    """One stable LSD pass: planes reordered so bit==0 rows precede
    bit==1 rows, order preserved within each class. n0 = count of zeros
    (traced scalar, for the splice)."""
    if interpret is False and jax.default_backend() == "cpu":
        interpret = True
    n = planes[0].shape[0]
    T = rows * L
    n_pad = ((n + T - 1) // T) * T
    ntiles = n_pad // T
    nplanes = len(planes)

    def as3d(p, fill=0):
        flat = jnp.full((n_pad,), fill, I32)
        flat = flat.at[:n].set(p.astype(I32))
        return flat.reshape(ntiles, rows, L)

    bit3 = as3d(bit.astype(I32), fill=1)  # array padding sorts to the end
    ops3 = [as3d(p) for p in planes]
    out_rows = n_pad // L + 2 * _W
    out_row_limit = out_rows - _F

    kern = functools.partial(_split1_kernel, nplanes, rows, out_row_limit,
                             not interpret)
    call = pl.pallas_call(
        kern, grid=(ntiles,),
        in_specs=[pl.BlockSpec((1, rows, L), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)] * (1 + nplanes),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * nplanes),
        out_shape=[jax.ShapeDtypeStruct((out_rows, L), I32)] * (2 * nplanes),
        scratch_shapes=[pltpu.VMEM((nplanes * _W, L), I32),
                        pltpu.VMEM((nplanes * _W, L), I32),
                        pltpu.SMEM((4,), I32),
                        pltpu.SemaphoreType.DMA((2 * nplanes,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret)
    with jax.enable_x64(False):
        outs = call(bit3, *ops3)
    zeros = [o.reshape(out_rows * L)[:n] for o in outs[:nplanes]]
    ones = [o.reshape(out_rows * L)[:n] for o in outs[nplanes:]]
    # splice: out[i] = zeros[i] for i < n0 else ones[i - n0]
    idx = jnp.arange(n, dtype=I32)
    return [jnp.where(idx < n0, z, jnp.roll(o, n0))
            for z, o in zip(zeros, ones)]


def lsd_radix_sort_bits(planes: list[jnp.ndarray],
                        bit_specs: list[tuple[int, int]],
                        interpret: bool = False) -> list[jnp.ndarray]:
    """Stable LSD radix sort of all planes by an arbitrary bit sequence:
    bit_specs is [(plane_index, bit_index), ...] in LSD order (least
    significant first). Unsigned bit order — callers bias signed planes.
    ONE compiled kernel serves every pass."""
    planes = [p.astype(I32) for p in planes]
    for pi, b in bit_specs:
        bit = (planes[pi] >> jnp.int32(b)) & 1
        n0 = jnp.sum((bit == 0).astype(I32))
        planes = _split1(planes, bit, n0, interpret=interpret)
    return planes


def lsd_radix_sort(key_planes: list[jnp.ndarray],
                   val_planes: list[jnp.ndarray],
                   num_rows, key_bits: int,
                   interpret: bool = False) -> list[jnp.ndarray]:
    """Stable LSD radix sort of all planes by the u32 key planes
    (little-endian plane order: key_planes[0] bits 0..31, [1] 32..63),
    over the low `key_bits` bits. Rows >= num_rows (live-prefix padding)
    stay at the end of every pass (an extra final pass on the live
    flag). Returns [key planes..., val planes...] in sorted order."""
    nk = len(key_planes)
    n = key_planes[0].shape[0]
    notlive = (jnp.arange(n, dtype=I32) >= num_rows).astype(I32)
    planes = [p.astype(I32) for p in key_planes] \
        + [p.astype(I32) for p in val_planes] + [notlive]
    specs = [(b // 32, b % 32) for b in range(key_bits)]
    assert key_bits <= 32 * nk
    specs.append((len(planes) - 1, 0))  # padding to the end, stably
    out = lsd_radix_sort_bits(planes, specs, interpret=interpret)
    return out[:-1]


def radix_sort_perm(keys: jnp.ndarray, num_valid=None) -> jnp.ndarray:
    """Permutation that stably sorts `keys` ascending (int64 order);
    rows >= num_valid order last."""
    if num_valid is not None:
        keys = jnp.where(jnp.arange(keys.shape[0]) < num_valid, keys,
                         jnp.iinfo(keys.dtype).max)
    idx = jnp.arange(keys.shape[0], dtype=I32)
    _, perm = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
    return perm


def sort_rows(t: Table, key: str = "key") -> Table:
    """Co-sort every column of t by `key` (padding last) in ONE
    multi-operand sort — no separate gather passes."""
    k = jnp.where(t.valid_mask(), t.col(key), jnp.iinfo(t.col(key).dtype).max)
    names = [n for n in t.names if n != key]
    sorted_ops = jax.lax.sort((k, *(t.columns[n] for n in names)),
                              num_keys=1, is_stable=True)
    cols = {key: sorted_ops[0]}
    cols.update(dict(zip(names, sorted_ops[1:])))
    return Table(cols, t.num_rows)


def msd_partition(keys: jnp.ndarray, num_valid, bits: int, part_cap: int):
    """Partition rows by the TOP `bits` of the (sign-biased) key: output
    partitions are contiguous, ordered key ranges — recursing or locally
    sorting each yields a full sort (MSD radix). Returns
    (rowid2d [2^bits, part_cap], valid2d, overflow)."""
    biased = (keys.astype(jnp.uint64) ^ jnp.uint64(1 << 63))
    npart = 1 << bits
    bucket = (biased >> jnp.uint64(64 - bits)).astype(I32)
    bucket = jnp.where(jnp.arange(keys.shape[0]) < num_valid, bucket, npart)
    rowid2d, valid2d, _, overflow = partition_padded(bucket, npart, part_cap)
    return rowid2d, valid2d, overflow
