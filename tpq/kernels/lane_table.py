"""C4 — lane-bucket hash table primitives shared by the join engines
(SURVEY.md §2.1 C4, §7.4.1; BASELINE.json:L5 "hash join (build+probe
with open-addressing ... tables laid out in HBM/VMEM tiles)"; oracle
twin: oracle/rh_table.h via oracle/main.cc hash_join).

Why this shape: v5e Mosaic supports exactly ONE fast dynamic gather —
`take_along_axis` along the 128-lane axis of one vreg row (measured in
scripts/tpu_r2_probe2.py; every cross-sublane / cross-vreg gather form
fails to compile — re-verified r4, scripts/tpu_r4_probes.py C). So the
table is laid out so a probe only ever gathers WITHIN a 128-lane row:

  * hash(key) -> (partition p = top pbits, lane l = low 7 bits). A
    partition's table is a [D, 128] tile set per plane: lane l's bucket
    is the column (0..D-1, l), i.e. up to D entries per lane.
  * build (build_lane_tables): one stable 1-key sort by the composite
    (bucket << 32) | h2 (h2 = 32-bit secondary hash; equal keys share
    h2 so their runs are contiguous in d — an exact cross-key h2
    collision flips the build hazard flag and falls back) + scan-based
    rank within bucket, then the PAD mover places rows at
    (p*128+l)*D + d in lane-major order — one transpose later the
    planes are [p, D, 128].
  * probe layout (_probe_layout): queries grouped by partition with one
    stable 1-key sort + PAD to [p, probe_cap] (identity when npart == 1
    — the broadcast tables of tpq/ops/skew_join.py).
  * walk (_walk): d = 0..D-1 rounds gathering table row d at each
    query's OWN lane — keys AND build payloads — entirely in-register;
    first K matches' payloads selected inline, multiplicities > K go to
    the compacted tail (_probe_emit_common).

The fused probe+emit KERNEL lives in tpq/kernels/lane2.py (v3: 32-row
query tiles, async staged flushes); probe_lane_tables here is the
unfused cnt-only walk used for membership probes. Static-capacity
violations (bucket depth > D, probe partition overflow, tail overflow)
route the whole join through the sorted engine via lax.cond — the
reference's "sort-merge fallback for high-skew keys" (BASELINE.json:L5).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.columnar import Table, next_pow2
from tpq.hashing import hash_keys
from tpq.kernels.move import pack, pad
from tpq.ops._expand import barrier, expand_segments
from tpq.ops.union_join import col_planes, planes_col

I32 = jnp.int32
I64 = jnp.int64
L = 128
SALT_LANE = 0x1A9E0001
SALT_H2 = 0x1A9E0002


@dataclass(frozen=True)
class LanePlan:
    pbits: int          # partitions = 2^pbits
    depth: int          # D: table rows (bucket capacity per lane)
    probe_cap: int      # padded probe rows per partition (mult of 1024)
    inline_k: int       # match ranks emitted inline
    tail_rows_cap: int  # compacted queries with cnt > K
    tail_out_cap: int   # tail output rows

    @property
    def npart(self) -> int:
        return 1 << self.pbits

    @property
    def nbuckets(self) -> int:
        return self.npart * L


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class LaneTables:
    plan: LanePlan
    key_planes: list[jnp.ndarray]   # each [npart, D, 128]
    pay_planes: list[jnp.ndarray]   # each [npart, D, 128]
    occ: jnp.ndarray                # [npart, D, 128]
    ok: jnp.ndarray                 # scalar bool

    def tree_flatten(self):
        return ((tuple(self.key_planes), tuple(self.pay_planes),
                 self.occ, self.ok), self.plan)

    @classmethod
    def tree_unflatten(cls, plan, children):
        kp, pp, occ, ok = children
        return cls(plan=plan, key_planes=list(kp), pay_planes=list(pp),
                   occ=occ, ok=ok)


def _rank_in_group(group: jnp.ndarray) -> jnp.ndarray:
    """group: sorted i32[N]. Returns i - first_index_of(group[i])."""
    from tpq.ops.scan import cummax_i32

    n = group.shape[0]
    i = jnp.arange(n, dtype=I32)
    new = jnp.concatenate([jnp.ones(1, bool), group[1:] != group[:-1]])
    return i - cummax_i32(jnp.where(new, i, -1))


def build_lane_tables(r: Table, plan: LanePlan, key: str = "key",
                      interpret: bool = False) -> LaneTables:
    D, npart = plan.depth, plan.npart
    rk = r.col(key)
    valid = r.valid_mask()
    h = hash_keys(rk, plan.pbits + 7, SALT_LANE)
    bucket = jnp.where(valid, h, plan.nbuckets).astype(I32)
    # Single-comparator sort key: (bucket << 32) | h2. Sorting by a
    # 32-bit secondary hash instead of the full key halves the lax.sort
    # comparator chain (measured: each extra sort KEY costs ~0.6 ms/M on
    # v5e and multiplies the XLA:TPU compile blowup). Equal keys still
    # land contiguously in d — they share h2 — UNLESS two distinct keys
    # in one bucket collide on all 32 h2 bits; that hazard is detected
    # exactly below and routes to the sorted fallback via `ok` (expected
    # rate: #same-bucket pairs x 2^-32 ~ 1e-3 at 1M rows).
    h2 = hash_keys(rk, 32, SALT_H2).astype(I64) & jnp.int64(0xFFFFFFFF)
    comp = (bucket.astype(I64) << jnp.int64(32)) | h2

    kp = list(col_planes(rk))
    pays = [p for n in r.names if n != key for p in col_planes(r.col(n))]
    ops = barrier((comp, *kp, *pays))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    comp_s = sorted_ops[0]
    bucket_s = (comp_s >> jnp.int64(32)).astype(I32)
    planes_s = [x.astype(I32) for x in sorted_ops[1:]]

    kp_s = planes_s[:len(kp)]
    same_comp = comp_s[1:] == comp_s[:-1]
    diff_key = jnp.zeros_like(same_comp)
    for a in kp_s:
        diff_key = diff_key | (a[1:] != a[:-1])
    live_pair = comp_s[1:] < (jnp.int64(plan.nbuckets) << jnp.int64(32))
    hazard = jnp.any(same_comp & diff_key & live_pair)

    rank = _rank_in_group(bucket_s)
    live = bucket_s < plan.nbuckets
    n_live = jnp.sum(valid.astype(I32))
    overflow = jnp.any(live & (rank >= D))
    dest = jnp.where(live & (rank < D), bucket_s * D + rank, plan.nbuckets * D)

    padded, occ = pad(planes_s, dest, n_live, plan.nbuckets * D,
                      interpret=interpret)
    # lane-major [p*128+l, D] -> [p, D, 128]
    def to_tiles(x):
        return jnp.swapaxes(x.reshape(npart, L, D), 1, 2)

    tiles = [to_tiles(x) for x in padded]
    return LaneTables(plan=plan,
                      key_planes=tiles[:len(kp)],
                      pay_planes=tiles[len(kp):],
                      occ=to_tiles(occ),
                      ok=~overflow & ~hazard)


# ---------------------------------------------------------------------------
# probe kernel
# ---------------------------------------------------------------------------

def _walk(D: int, K: int, t_keys, t_occ, t_pays, qk, lane_v, live):
    """The D-round in-register bucket walk shared by both probe kernels:
    gathers table row d at each query's own lane, accumulates the match
    count, first match depth, and the first K matches' payloads."""
    shape = lane_v.shape
    npay = len(t_pays)
    # Bucket lengths: build packs each (partition, lane) bucket at ranks
    # 0..cnt-1 (build_lane_tables dest = bucket*D + rank), so
    # occ[d, l] > 0  <=>  d < blen[l]. ONE blen gather per query replaces
    # the per-round occ gather — 1 of the nkp+1+npay gathers in every
    # walk round (docs/PERF_NOTES.md lever 4). f32 reduce: Mosaic lowers
    # int reductions through an i64 proxy v5e lacks; exact for D < 2^24.
    blen_row = jnp.sum(t_occ[0].astype(jnp.float32), axis=0,
                       keepdims=True).astype(I32)
    blen_v = jnp.take_along_axis(
        jnp.broadcast_to(blen_row, shape), lane_v, axis=1)
    cnt = jnp.zeros(shape, I32)
    d_first = jnp.full(shape, -1, I32)
    pay_sel = [[jnp.zeros(shape, I32) for _ in range(npay)] for _ in range(K)]
    for d in range(D):
        gk = [jnp.take_along_axis(
            jnp.broadcast_to(t[0, d][None, :], shape), lane_v, axis=1)
            for t in t_keys]
        m = live & (d < blen_v)
        for a, b in zip(gk, qk):
            m = m & (a == b)
        gp = [jnp.take_along_axis(
            jnp.broadcast_to(t[0, d][None, :], shape), lane_v, axis=1)
            for t in t_pays]
        for j in range(K):
            sel = m & (cnt == j)
            for i in range(npay):
                pay_sel[j][i] = jnp.where(sel, gp[i], pay_sel[j][i])
        d_first = jnp.where(m & (cnt == 0), d, d_first)
        cnt = cnt + m.astype(I32)
    return cnt, d_first, pay_sel


def _probe_kernel(D: int, K: int, nkp: int, npay: int, *refs):
    # refs: table key planes (nkp) + occ + pay planes (npay), query key
    # planes (nkp) + lane + qocc, outputs: cnt, d_first, K*npay pay outs
    nt = nkp + 1 + npay
    tabs = refs[:nt]
    q = refs[nt:nt + nkp + 2]
    outs = refs[nt + nkp + 2:]
    t_keys, t_occ, t_pays = tabs[:nkp], tabs[nkp], tabs[nkp + 1:]
    q_keys, lane, qocc = q[:nkp], q[nkp], q[nkp + 1]

    lane_v = lane[0]
    qk = [x[0] for x in q_keys]
    live = qocc[0] > 0
    cnt, d_first, pay_sel = _walk(D, K, t_keys, t_occ, t_pays, qk, lane_v, live)
    outs[0][0] = cnt
    outs[1][0] = d_first
    oi = 2
    for j in range(K):
        for i in range(npay):
            outs[oi][0] = pay_sel[j][i]
            oi += 1


def _probe_layout(plan: LanePlan, s: Table, key: str,
                  interpret: bool = False, keep=None):
    """Shared probe-side preamble: group queries by partition (one
    1-key stable sort — `lane` is NOT carried through the sort, it is
    recomputed from the padded key planes, saving an operand in both
    the sort and the PAD) and pad to the [npart, probe_cap] layout.

    `keep` (optional bool[capacity]) is a pushed-down filter predicate:
    dropped rows route to the dead partition exactly like padding, so a
    filter -> join pipeline pays ZERO extra passes — the compaction the
    standalone filter operator does with its own multi-operand sort
    (tpq/ops/filter.py) is absorbed into the grouping sort that already
    runs here (the config-4 fusion, BASELINE.json:L10).

    Returns (qk_p, spay_p, lane_p, qocc, overflow)."""
    npart, probe_cap = plan.npart, plan.probe_cap
    sk = s.col(key)
    valid = s.valid_mask()
    if keep is not None:
        valid = valid & keep
    h = hash_keys(sk, plan.pbits + 7, SALT_LANE)
    if npart == 1 and probe_cap == s.capacity:
        # single-partition (broadcast) table: the probe layout is the
        # identity — no grouping sort, no PAD. Used by the skew path's
        # VMEM-resident mini tables (tpq/ops/skew_join.py), where the
        # whole table is one [D, 128] tile set and every query probes it.
        kp = [x.astype(I32) for x in col_planes(sk)]
        pays = [p_.astype(I32) for n in s.names if n != key
                for p_ in col_planes(s.col(n))]
        lane_p = (h & (L - 1)).astype(I32)
        return kp, pays, lane_p, valid.astype(I32), jnp.bool_(False)
    p = (h >> 7).astype(I32)
    bucket_p = jnp.where(valid, p, npart).astype(I32)

    kp = list(col_planes(sk))
    pays = [pl_ for n in s.names if n != key for pl_ in col_planes(s.col(n))]
    ops = barrier((bucket_p, *kp, *pays))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    bp_s = sorted_ops[0]
    rest = [x.astype(I32) for x in sorted_ops[1:]]

    rank = _rank_in_group(bp_s)
    live = bp_s < npart
    n_live = jnp.sum(valid.astype(I32))
    overflow = jnp.any(live & (rank >= probe_cap))
    dest = jnp.where(live & (rank < probe_cap),
                     bp_s * probe_cap + rank, npart * probe_cap)

    padded, qocc = pad(rest, dest, n_live, npart * probe_cap,
                       interpret=interpret)
    qk_p = padded[:len(kp)]
    spay_p = padded[len(kp):]
    # lane from the padded key planes (dead slots get a garbage lane —
    # the kernels mask them with qocc)
    key_back = planes_col(tuple(x.astype(jnp.uint32) for x in qk_p),
                          sk.dtype)
    h_back = hash_keys(key_back, plan.pbits + 7, SALT_LANE)
    lane_p = (h_back & (L - 1)).astype(I32)
    return qk_p, spay_p, lane_p, qocc, overflow


def probe_lane_tables(tables: LaneTables, s: Table, key: str = "key",
                      interpret: bool = False):
    """Returns (query planes dict, cnt, d_first, inline pay planes
    [K][npay], qocc, p_idx, lane, overflow) — all in the padded
    [npart * probe_cap] probe order."""
    plan = tables.plan
    D, K, npart, probe_cap = plan.depth, plan.inline_k, plan.npart, plan.probe_cap
    qk_p, spay_p, lane_p, qocc, overflow = _probe_layout(
        plan, s, key, interpret)

    nkp, npay = len(tables.key_planes), len(tables.pay_planes)
    qrows = probe_cap // L
    grid = (npart, qrows // 8)
    tspec = pl.BlockSpec((1, D, L), lambda pi, t: (pi, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, 8, L), lambda pi, t: (pi, t, 0),
                         memory_space=pltpu.VMEM)

    def q3(x):
        return x.reshape(npart, qrows, L)

    n_out = 2 + K * npay
    kern = functools.partial(_probe_kernel, D, K, nkp, npay)
    call = pl.pallas_call(
        kern, grid=grid,
        in_specs=[tspec] * (nkp + 1 + npay) + [qspec] * (nkp + 2),
        out_specs=[qspec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((npart, qrows, L), I32)] * n_out,
        interpret=interpret or jax.default_backend() == "cpu")
    with jax.enable_x64(False):
        outs = call(*tables.key_planes, tables.occ, *tables.pay_planes,
                    *[q3(x) for x in qk_p], q3(lane_p), q3(qocc))
    outs = [o.reshape(npart * probe_cap) for o in outs]
    cnt, d_first = outs[0], outs[1]
    inline_pays = [[outs[2 + j * npay + i] for i in range(npay)]
                   for j in range(K)]
    return (qk_p, spay_p, cnt, d_first, inline_pays, qocc,
            lane_p, overflow)


# ---------------------------------------------------------------------------
# the join operator
# ---------------------------------------------------------------------------

def _probe_emit_common(fused_fn, tables: LaneTables, s: Table,
                       out_capacity: int, key: str,
                       r_names: list[str] | None,
                       r_dtypes: list | None,
                       interpret: bool, keep=None) -> tuple[Table, jnp.ndarray]:
    """Shared emit/tail/regroup half of probe-emit, parameterized by the
    fused walk+emit kernel (v3 tpq/kernels/lane2.fused_probe_emit2).
    `keep` is the pushed-down filter mask (see _probe_layout)."""
    plan = tables.plan
    K = plan.inline_k
    if r_names is None:
        npay_cols = len(tables.pay_planes) // 2
        r_names = [f"p{i}" for i in range(npay_cols)]
        r_dtypes = [jnp.int64] * npay_cols
    s_names = [n for n in s.names if n != key]
    out_dtypes = ([s.col(key).dtype] + list(r_dtypes)
                  + [s.col(n).dtype for n in s_names])

    (out_planes, cnt, d_first, qk_p, spay_p, qocc, lane_p,
     probe_ovf) = fused_fn(tables, s, out_capacity, key, interpret, keep=keep)

    u = plan.npart * plan.probe_cap
    live_q = qocc > 0
    cnt_eff = jnp.where(live_q, cnt, 0)
    if u * plan.depth < 2**31:
        # statically bounded: total <= u * D, so plain i32 sums are exact.
        # The i64 forms cost 2.5 ms at config-1 (scripts/tpu_r5_probes.py
        # "i64 totals" delta) — v5e reduces i64 through slow emulation.
        total = jnp.sum(cnt_eff)
        total_inline = jnp.sum(jnp.minimum(cnt_eff, K))
        tail_out64 = (total - total_inline).astype(jnp.int64)
    else:
        total64 = jnp.sum(cnt_eff.astype(jnp.int64))
        total = jnp.minimum(total64, jnp.int64(2**31 - 1)).astype(I32)
        inline64 = jnp.sum(jnp.minimum(cnt_eff, K).astype(jnp.int64))
        total_inline = jnp.minimum(inline64, jnp.int64(2**31 - 1)).astype(I32)
        tail_out64 = total64 - inline64
    tail_rows = jnp.sum((cnt_eff > K).astype(I32))
    caps_ok = (tail_rows <= plan.tail_rows_cap) & \
        (tail_out64 <= plan.tail_out_cap) & (total_inline <= out_capacity)
    ok = tables.ok & (~probe_ovf) & caps_ok

    nkp = len(qk_p)
    npay = len(tables.pay_planes)

    def _nplanes(dt) -> int:
        return 2 if dt in (jnp.int64, jnp.uint64) else 1

    # The Table contract leaves rows >= num_rows unspecified, so the
    # fused buffer's unwritten slots stay as-is (a full-capacity zeroing
    # pass cost 0.42 ms at config-1, scripts/tpu_r5_probes.py); only the
    # tail splice window below must be cleared before its add.
    base = list(out_planes)

    # ---- tail: queries with cnt > K. PACK carries ONLY the padded row
    # id (1 plane over u instead of 5 — the pack pass is u-length and
    # sequential, so plane count is its cost); everything else is
    # re-derived by tiny tcap-sized gathers. The tail rows are then
    # PADded into a small static window at total_inline and spliced
    # with a dynamic-slice add — never a full out_capacity-length pad.
    tcap = plan.tail_rows_cap
    # dest offset within window < 2048; small out_capacity degenerates to
    # the full-length pad (w0 = 0), same drop-beyond-capacity semantics
    window = min(plan.tail_out_cap + 2048, out_capacity)

    def tail(_):
        tflag = (cnt_eff > K).astype(I32)
        tplanes, n_t = pack([jnp.arange(u, dtype=I32)], tflag)
        tq = jnp.minimum(tplanes[0][:tcap], u - 1)
        t_live = jnp.arange(tcap, dtype=I32) < n_t
        td, tc, tl = d_first[tq], cnt_eff[tq], lane_p[tq]
        tp = tq // plan.probe_cap
        counts_t = jnp.where(t_live, tc - K, 0)
        seg, rnk, _, vout = expand_segments(counts_t, plan.tail_out_cap)
        # matched run is contiguous in d (same h2, checked at build):
        # extra match m sits at d_first + K + rnk in the same bucket
        d_pick = jnp.minimum(td[seg] + K + rnk, plan.depth - 1)
        flat = (tp[seg] * plan.depth + d_pick) * L + tl[seg]
        flat = jnp.clip(flat, 0, plan.npart * plan.depth * L - 1)
        tpay = [jnp.where(vout, t.reshape(-1)[flat], 0)
                for t in tables.pay_planes]
        qsrc = jnp.minimum(tq[seg], u - 1)
        tkey = [jnp.where(vout, x[qsrc], 0) for x in qk_p]
        tspay = [jnp.where(vout, x[qsrc], 0) for x in spay_p]

        tail_planes = tkey + tpay + tspay
        tail_n = jnp.minimum(
            jnp.sum(vout.astype(I32)),
            jnp.maximum(out_capacity - total_inline, 0))
        w0 = jnp.clip((total_inline // 1024) * 1024, 0,
                      max(out_capacity - window, 0))
        # rows whose window-relative dest >= window are dropped by pad's
        # clamp; that only happens when the output overflows out_capacity,
        # which num_rows=total already surfaces to the caller
        wdest = (total_inline - w0) + jnp.arange(plan.tail_out_cap,
                                                 dtype=I32)
        wplanes, _ = pad(tail_planes, wdest, tail_n, window,
                         interpret=interpret)
        # slots at/after total_inline inside the window hold unwritten
        # garbage (see base above) — clear them before adding tail rows
        in_tail = (w0 + jnp.arange(window, dtype=I32)) >= total_inline
        out = []
        for b, wq in zip(base, wplanes):
            win = jax.lax.dynamic_slice(b, (w0,), (window,))
            win = jnp.where(in_tail, 0, win) + wq
            out.append(jax.lax.dynamic_update_slice(b, win, (w0,)))
        return out

    def no_tail(_):
        return base

    merged = jax.lax.cond(tail_out64 > 0, tail, no_tail, operand=None)

    # regroup planes into named columns
    cols = {}
    pos = 0
    groups = [(key, nkp)]
    groups += [(f"r_{n}", _nplanes(dt))
               for n, dt in zip(r_names, r_dtypes)]
    groups += [(f"s_{n}", _nplanes(s.col(n).dtype)) for n in s_names]
    for (name, npl), dt in zip(groups, out_dtypes):
        cols[name] = planes_col(
            tuple(p.astype(jnp.uint32) for p in merged[pos:pos + npl]), dt)
        pos += npl
    return Table(cols, total), ok
