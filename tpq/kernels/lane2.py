"""C4 v3 — lane-bucket hash join: bigger-tile fused probe+emit with
async staged flushes (VERDICT r3 items 2-3; BASELINE.json:L5 "hash join
(build+probe with open-addressing ... tables laid out in HBM/VMEM
tiles)"; oracle twin: oracle/main.cc hash_join).

Same layout family as lane_table.py (v2) — hash(key) -> (partition p,
lane l), table tiles [D, 128] per plane, probe rows grouped by partition
into padded probe_cap regions — retuned from scripts/tpu_r4_probes.py
measurements on this chip:

  * OCCUPANCY 16 (npart = capacity/2048, D = 56): halves the partition
    count; probe_cap = 3072 at config-1 shape cuts the padded probe
    universe u from 2.0x to 1.5x of the probe rows. Every walk/emit cost
    scales with u.
  * QUERY TILES (32,128) = four 1024-row chunks. probe_cap is a multiple
    of 1024, so chunk c belongs STATICALLY to partition c // (probe_cap
    / 1024): the kernel binds four table windows with static index_maps
    (no scalar prefetch) and walks each 8-row group against its own
    window — one gather per plane per round, no cross-window selects.
  * ASYNC STAGED FLUSH at F=128 rows. The r3 fused kernel start+waited
    its flush DMAs every (8,128) step: 3.4 us/step x 2048 steps =
    7.6 ms emit at config-1. Measured (tpu_r4_probes.py A): the same
    route+merge+flush work at 32-row tiles with a staging buffer and a
    wait-only-previous-flush discipline runs ~1.9 us/step x 512 steps.
  * GROUPING stays ONE stable 1-key lax.sort per side. Measured: 1-key
    composite + 4 operands sorts at 2.0-2.8 ms/M up to 8M rows — the
    645 s compiles / superlinear blowups were multi-KEY forms. A Pallas
    k-bit split ladder cannot beat it (a 1-bit split pass measures
    ~0.4 ms/M, route-network-bound, so >= 9 grouping bits cost more
    than the sort) — VERDICT r3's multi-bit-ladder lever is measured
    out, not skipped (docs/PERF_NOTES.md).

Build, probe grouping (_probe_layout), tail splice, and the fallback
contract are shared with lane_table.py; this module replaces only the
plan and the fused kernel. Static-capacity violations (bucket depth,
probe partition, tail) still route to the union-sort engine via
lax.cond; genuinely skewed keys belong on tpq/ops/skew_join.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.columnar import Table, next_pow2
from tpq.kernels.lane_table import (L, LanePlan, LaneTables, _probe_layout,
                                    _walk, build_lane_tables)

I32 = jnp.int32
QROWS = 32  # query tile rows; 4 chunk-groups of (8,128)


def plan_lane2(r_capacity: int, s_capacity: int, depth: int = 48,
               mean_occupancy: int = 16, inline_k: int = 4,
               out_capacity: int | None = None) -> LanePlan:
    """v3 plan: occupancy 16, probe_cap = mean partition load * 1.5
    rounded to the 1024-chunk grain (>= mean + 5 sigma + duplicate
    margin for uniform keys at benchmark scales)."""
    npart = next_pow2(max(1, r_capacity // (L * mean_occupancy)))
    pbits = npart.bit_length() - 1
    per_part = max(1, s_capacity // npart)
    probe_cap = ((per_part * 3 // 2) + 1023) // 1024 * 1024
    probe_cap = max(1024, probe_cap)
    while npart * probe_cap < QROWS * L:  # tiny relations: one full tile
        probe_cap += 1024
    u = npart * probe_cap
    # tail caps: every tcap-sized XLA gather in the tail path costs
    # ~16 ms/M gathered elements, so the static caps are kept just above
    # the Poisson expectation (P(cnt>4) ~ 0.4% of u) — measured r4: the
    # r3-sized caps (u>>5) made tail+glue a 3.1 ms phase at config-1
    return LanePlan(pbits=pbits, depth=depth, probe_cap=probe_cap,
                    inline_k=inline_k,
                    tail_rows_cap=max(2048, u >> 7),
                    tail_out_cap=max(4096, min(out_capacity or u, u) >> 8))


# ---------------------------------------------------------------------------
# fused walk + emit kernel
# ---------------------------------------------------------------------------

def _fused2_kernel(D: int, K: int, nkp: int, npay: int, nspay: int,
                   out_row_limit: int, mosaic: bool, flush_rows: int,
                   *refs):
    from tpq.kernels.move import _flat_cumsum_excl, _flat_roll_dyn
    from tpq.kernels.shift_network import route

    nout = nkp + npay + nspay
    ntab = nkp + 1 + npay
    nq = nkp + 2 + nspay
    pos = 0
    tabs = [refs[pos + g * ntab:pos + (g + 1) * ntab] for g in range(4)]
    pos += 4 * ntab
    q = refs[pos:pos + nq]; pos += nq
    cnt_out, dfirst_out = refs[pos], refs[pos + 1]; pos += 2
    outs = refs[pos:pos + nout]; pos += nout
    acc, stage, cur, sem = refs[pos], refs[pos + 1], refs[pos + 2], refs[pos + 3]

    q_keys, lane, qocc = q[:nkp], q[nkp], q[nkp + 1]
    q_spay = q[nkp + 2:]

    F = flush_rows
    W = 2 * F
    t = pl.program_id(0)
    last = t == pl.num_programs(0) - 1

    @pl.when(t == 0)
    def _():
        cur[0] = 0  # flushed rows
        cur[1] = 0  # live elements in the carry window
        cur[2] = 0  # flush-DMA-pending flag
        cur[3] = 0  # pending flush's dest row
        acc[:] = jnp.zeros_like(acc)

    # per-group walk: rows [8g, 8g+8) of the tile against table window g
    cnt_g, df_g = [], []
    pay_g = [[[] for _ in range(npay)] for _ in range(K)]
    for g in range(4):
        tg = tabs[g]
        t_keys, t_occ, t_pays = tg[:nkp], tg[nkp], tg[nkp + 1:]
        sl = slice(8 * g, 8 * g + 8)
        qk = [x[0][sl] for x in q_keys]
        lane_v = lane[0][sl]
        live = qocc[0][sl] > 0
        cnt, d_first, pay_sel = _walk(D, K, t_keys, t_occ, t_pays,
                                      qk, lane_v, live)
        cnt_g.append(cnt)
        df_g.append(d_first)
        for j in range(K):
            for i in range(npay):
                pay_g[j][i].append(pay_sel[j][i])
    cnt = jnp.concatenate(cnt_g, axis=0)          # (QROWS, L)
    d_first = jnp.concatenate(df_g, axis=0)
    pay_sel = [[jnp.concatenate(pay_g[j][i], axis=0) for i in range(npay)]
               for j in range(K)]
    cnt_out[0] = cnt
    dfirst_out[0] = d_first

    live = qocc[0] > 0
    qk_full = [x[0] for x in q_keys]
    occ_cand = jnp.concatenate(
        [(live & (cnt > j)).astype(I32) for j in range(K)], axis=0)
    cand = ([jnp.concatenate([x] * K, axis=0) for x in qk_full]
            + [jnp.concatenate([pay_sel[j][i] for j in range(K)], axis=0)
               for i in range(npay)]
            + [jnp.concatenate([x[0]] * K, axis=0) for x in q_spay])

    flat = (jax.lax.broadcasted_iota(I32, occ_cand.shape, 0) * L
            + jax.lax.broadcasted_iota(I32, occ_cand.shape, 1))
    rank = _flat_cumsum_excl(occ_cand, mosaic)
    shift = (flat - rank) * occ_cand
    moved, _ = route(cand, occ_cand, shift, "pack", mosaic=mosaic)
    # f32 reduce: Mosaic lowers int reductions via an unsupported i64
    # proxy on v5e; exact for block counts < 2^24
    arrivals = jnp.sum(occ_cand.astype(jnp.float32)).astype(I32)

    c, alen = cur[0], cur[1]
    total_now = alen + arrivals
    zpad = jnp.zeros((W - K * QROWS, L), I32)
    for i in range(nout):
        buf = jnp.concatenate([moved[i], zpad], axis=0)      # (W, L)
        buf = _flat_roll_dyn(buf, alen, mosaic)               # no wrap
        acc[i * W:(i + 1) * W, :] = acc[i * W:(i + 1) * W, :] + buf
    full = total_now >= F * L

    def wait_prev():
        pc_ = cur[3]
        for i in range(nout):
            pltpu.make_async_copy(
                stage.at[pl.ds(i * F, F), :],
                outs[i].at[pl.ds(pc_, F), :], sem.at[i]).wait()

    @pl.when(full)
    def _():
        @pl.when(cur[2] > 0)
        def _():
            wait_prev()
        dest = jnp.minimum(c, out_row_limit)
        for i in range(nout):
            stage[i * F:(i + 1) * F, :] = acc[i * W:i * W + F, :]
        for i in range(nout):
            pltpu.make_async_copy(
                stage.at[pl.ds(i * F, F), :],
                outs[i].at[pl.ds(dest, F), :], sem.at[i]).start()
        cur[2] = 1
        cur[3] = dest
        rowi = jax.lax.broadcasted_iota(I32, (W, L), 0)
        for i in range(nout):
            w = acc[i * W:(i + 1) * W, :]
            if mosaic:
                w = pltpu.roll(w, W - F, 0)
            else:
                w = jnp.roll(w, W - F, 0)
            acc[i * W:(i + 1) * W, :] = jnp.where(rowi < W - F, w, 0)
        cur[0] = c + F
        cur[1] = total_now - F * L

    @pl.when(~full)
    def _():
        cur[1] = total_now

    # drain: retire the in-flight flush, then write the carry window
    @pl.when(last)
    def _():
        @pl.when(cur[2] > 0)
        def _():
            wait_prev()
        dest = jnp.minimum(cur[0], out_row_limit)
        copies = []
        for i in range(nout):
            dma = pltpu.make_async_copy(
                acc.at[pl.ds(i * W, F), :],
                outs[i].at[pl.ds(dest, F), :], sem.at[i])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()


def fused_probe_emit2(tables: LaneTables, s: Table, out_capacity: int,
                      key: str = "key", interpret: bool = False, keep=None):
    """v3 fused probe+emit (outputs in the padded [npart * probe_cap]
    probe order), on (32,128) query tiles with async flushes. `keep` is
    the pushed-down filter mask (see lane_table._probe_layout)."""
    if interpret is False and jax.default_backend() == "cpu":
        interpret = True
    plan = tables.plan
    D, K, npart, probe_cap = plan.depth, plan.inline_k, plan.npart, plan.probe_cap
    qk_p, spay_p, lane_p, qocc, overflow = _probe_layout(
        plan, s, key, interpret, keep=keep)

    nkp, npay, nspay = len(tables.key_planes), len(tables.pay_planes), len(spay_p)
    nout = nkp + npay + nspay
    u = npart * probe_cap
    assert u % (QROWS * L) == 0
    ntiles = u // (QROWS * L)
    cpp = probe_cap // 1024  # chunks per partition

    def tspec(g):
        return pl.BlockSpec((1, D, L),
                            lambda t, g=g: ((4 * t + g) // cpp, 0, 0),
                            memory_space=pltpu.VMEM)

    qspec = pl.BlockSpec((1, QROWS, L), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)

    def q3(x):
        return x.reshape(ntiles, QROWS, L)

    flush_rows = max(64, K * QROWS)
    W = 2 * flush_rows
    out_rows = (out_capacity + L - 1) // L + W
    out_row_limit = out_rows - flush_rows
    kern = functools.partial(_fused2_kernel, D, K, nkp, npay, nspay,
                             out_row_limit, not interpret, flush_rows)
    ntab = nkp + 1 + npay
    call = pl.pallas_call(
        kern, grid=(ntiles,),
        in_specs=[tspec(g) for g in range(4) for _ in range(ntab)]
        + [qspec] * (nkp + 2 + nspay),
        out_specs=[qspec] * 2 + [pl.BlockSpec(memory_space=pl.ANY)] * nout,
        out_shape=([jax.ShapeDtypeStruct((ntiles, QROWS, L), I32)] * 2
                   + [jax.ShapeDtypeStruct((out_rows, L), I32)] * nout),
        scratch_shapes=[pltpu.VMEM((nout * W, L), I32),
                        pltpu.VMEM((nout * flush_rows, L), I32),
                        pltpu.SMEM((4,), I32),
                        pltpu.SemaphoreType.DMA((nout,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret or jax.default_backend() == "cpu")
    tabs = list(tables.key_planes) + [tables.occ] + list(tables.pay_planes)
    with jax.enable_x64(False):
        outs = call(*(tabs * 4),
                    *[q3(x) for x in qk_p], q3(lane_p), q3(qocc),
                    *[q3(x) for x in spay_p])
    cnt = outs[0].reshape(u)
    d_first = outs[1].reshape(u)
    out_planes = [o.reshape(out_rows * L)[:out_capacity] for o in outs[2:]]
    return (out_planes, cnt, d_first, qk_p, spay_p, qocc, lane_p, overflow)


# ---------------------------------------------------------------------------
# operator wrappers (emit/tail logic shared with lane_table via injection)
# ---------------------------------------------------------------------------

def build_lane2_tables(r: Table, plan: LanePlan, key: str = "key",
                       interpret: bool = False) -> LaneTables:
    """v3 build = v2 build (1-key composite sort + rank + PAD into
    [npart, D, 128] tiles) at the v3 plan's occupancy/depth."""
    return build_lane_tables(r, plan, key, interpret)


def lane2_probe_emit(tables: LaneTables, s: Table, out_capacity: int,
                     key: str = "key", r_names: list[str] | None = None,
                     r_dtypes: list | None = None,
                     interpret: bool = False,
                     keep=None) -> tuple[Table, jnp.ndarray]:
    from tpq.kernels.lane_table import _probe_emit_common

    return _probe_emit_common(fused_probe_emit2, tables, s, out_capacity,
                              key, r_names, r_dtypes, interpret, keep=keep)


def lane2_path_taken(r: Table, s: Table, out_capacity: int, key: str = "key",
                     plan: LanePlan | None = None) -> jnp.ndarray:
    """The `ok` flag lane2_hash_join conds on (bench honesty guard)."""
    if plan is None:
        plan = plan_lane2(r.capacity, s.capacity, out_capacity=out_capacity)
    tables = build_lane2_tables(r, plan, key)
    _, ok = lane2_probe_emit(tables, s, out_capacity, key=key,
                             r_names=[n for n in r.names if n != key],
                             r_dtypes=[r.col(n).dtype for n in r.names
                                       if n != key])
    return ok


def lane2_hash_join(r: Table, s: Table, out_capacity: int, key: str = "key",
                    plan: LanePlan | None = None,
                    interpret: bool = False, probe_keep=None) -> Table:
    """v3 lane join with the union-sort engine as the lax.cond fallback
    on any static-capacity violation. `probe_keep` (bool[s.capacity]) is
    a pushed-down probe-side filter predicate — equivalent to joining
    against filter(s) but with the compaction absorbed into the probe
    grouping sort (the config-4 fusion)."""
    from tpq.ops.union_join import union_join

    if plan is None:
        plan = plan_lane2(r.capacity, s.capacity, out_capacity=out_capacity)
    r_names = [n for n in r.names if n != key]
    r_dtypes = [r.col(n).dtype for n in r_names]

    tables = build_lane2_tables(r, plan, key, interpret)
    out, ok = lane2_probe_emit(tables, s, out_capacity, key=key,
                               r_names=r_names, r_dtypes=r_dtypes,
                               interpret=interpret, keep=probe_keep)

    def keep_branch(_):
        return out

    def fallback(_):
        if probe_keep is not None:
            from tpq.ops.filter import compact

            return union_join(r, compact(s, probe_keep), out_capacity, key=key)
        return union_join(r, s, out_capacity, key=key)

    return jax.lax.cond(ok, keep_branch, fallback, operand=None)
