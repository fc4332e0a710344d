"""C4 — radix-partitioned robin-hood hash table: build + Pallas VMEM probe
(SURVEY.md §2.1 C4, §7.4.1; BASELINE.json:L5 "hash join (build+probe with
open-addressing/robin-hood tables)", "radix-partitioned build tables laid
out in HBM/VMEM tiles"; oracle twin: oracle/rh_table.h).

Key insight making the build vectorizable (SURVEY.md §7.4.1): a
robin-hood linear-probe table's content IS its entries sorted by home
slot. So build = one lexicographic sort by (partition, slot, key) plus a
cummax placement
    pos_i = i + cummax(slot_i - i)
per partition row — no serial insertion loop exists anywhere. Equal keys
land in consecutive slots (their run), so probes return (first_slot,
run_count) and emission is the standard segment expansion.

Probe is a Pallas kernel: each grid step holds one partition's table
planes in VMEM and streams a probe tile through D unrolled rounds of
`take_along_axis` displacement walk — all lanes in lockstep, no per-row
control flow. Keys are compared as 2x int32 planes (full 64-bit
equality — collisions are impossible, not merely unlikely).

Exactness fallback: the build computes the true max first-occurrence
displacement; if it exceeds the static walk depth D (adversarial/heavily
skewed partitions), the whole join routes through the sorted impl via
`lax.cond` — the reference's "sort-merge fallback for high-skew keys"
(BASELINE.json:L5).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpq.columnar import Table, next_pow2
from tpq.hashing import hash_keys, split_i64
from tpq.kernels.radix_partition import padded_gather, partition_starts
from tpq.ops._expand import expand_segments

SALT_PART = 0x7A37A001
SALT_SLOT = 0x7A37A002

I32 = jnp.int32
BIG = jnp.int32(1 << 30)


@dataclass(frozen=True)
class RHPlan:
    pbits: int          # number of partitions = 2^pbits
    part_cap: int       # padded build rows per partition
    table_bits: int     # table slots per partition = 2^table_bits
    table_pad: int      # table plane width (slots + displacement margin)
    probe_cap: int      # padded probe rows per partition
    probe_tile: int     # probe rows per kernel grid step
    max_disp: int       # static displacement walk depth D

    @property
    def npart(self) -> int:
        return 1 << self.pbits

    @property
    def table_cap(self) -> int:
        return 1 << self.table_bits


def plan_rh(r_capacity: int, s_capacity: int, target_part_rows: int = 8192,
            load_factor: float = 0.5, max_disp: int = 32,
            build_slack: float = 2.0, probe_slack: float = 2.0) -> RHPlan:
    """Pick partition count so one partition's table + probe tile sit in
    VMEM (SURVEY.md §7.3.2: partition to VMEM, not to L2)."""
    npart = max(1, next_pow2(max(1, r_capacity // target_part_rows)))
    pbits = npart.bit_length() - 1
    part_rows = max(8, r_capacity // npart)
    part_cap = next_pow2(int(part_rows * build_slack))
    table_cap = max(128, next_pow2(int(part_cap / load_factor / build_slack)))
    # Mosaic's dynamic_gather needs a BATCHED gather: indices shaped
    # (8, W) against an (8, W) operand (the size-1-batch form lowers to an
    # unbatched gather Mosaic rejects). One probe tile is therefore
    # 8 sublane rows x W lanes = 8*W probes, where W = table_pad (table
    # slots + 128-lane-aligned walk margin); the table row is broadcast
    # across the 8 sublanes inside the kernel.
    table_pad = table_cap + ((max_disp + 1 + 127) // 128) * 128
    probe_tile = 8 * table_pad
    probe_needed = max(128, int(s_capacity // npart * probe_slack))
    probe_cap = ((probe_needed + probe_tile - 1) // probe_tile) * probe_tile
    return RHPlan(pbits=pbits, part_cap=part_cap,
                  table_bits=table_cap.bit_length() - 1,
                  table_pad=table_pad,
                  probe_cap=probe_cap, probe_tile=probe_tile, max_disp=max_disp)


# ---------------------------------------------------------------------------
# build (XLA): partition (C3) + slot-sort + cummax placement + table planes
# ---------------------------------------------------------------------------

_partition_starts = partition_starts
_padded_gather = padded_gather


@dataclass
class RHTables:
    """Build product: per-partition table planes + padded row planes."""

    plan: RHPlan
    # table planes [npart, table_pad]
    t_key_lo: jnp.ndarray
    t_key_hi: jnp.ndarray
    t_count: jnp.ndarray      # run length at first-of-run slots, else 0
    t_rowflat: jnp.ndarray    # p*part_cap + j of the entry
    # padded build rows [npart, part_cap]
    b_rowid: jnp.ndarray      # original R row index
    b_valid: jnp.ndarray
    ok: jnp.ndarray           # scalar bool: no overflow, disp within D


def build_rh_tables(r: Table, plan: RHPlan, key: str = "key") -> RHTables:
    cap = r.capacity
    npart, part_cap = plan.npart, plan.part_cap
    table_pad = plan.table_pad

    rk = r.col(key)
    valid = r.valid_mask()
    bucket = jnp.where(valid, hash_keys(rk, plan.pbits, SALT_PART) if plan.pbits > 0
                       else jnp.zeros(cap, I32), npart)
    slot = hash_keys(rk, plan.table_bits, SALT_SLOT)
    idx = jnp.arange(cap, dtype=I32)
    # barrier sort operands: a fused producer chain on a sort input
    # serializes on TPU (see tpq/ops/_expand.py barrier docstring)
    bucket, slot = jax.lax.optimization_barrier((bucket, slot))
    bucket_s, slot_s, key_s, idx_s = jax.lax.sort(
        (bucket, slot, rk, idx), num_keys=3, is_stable=True)

    starts = _partition_starts(bucket_s, npart)
    part_len = starts[1:] - starts[:-1]
    overflow_build = jnp.any(part_len > part_cap)

    slot2d, valid2d = _padded_gather(slot_s, starts, npart, part_cap)
    key2d, _ = _padded_gather(key_s, starts, npart, part_cap)
    rowid2d, _ = _padded_gather(idx_s, starts, npart, part_cap)

    i2d = jnp.arange(part_cap, dtype=I32)[None, :]
    slot_eff = jnp.where(valid2d, slot2d, plan.table_cap + plan.max_disp)
    pos = i2d + jax.lax.cummax(slot_eff - i2d, axis=1)
    overflow_pos = jnp.any(jnp.where(valid2d, pos, -1) >= table_pad)

    # run structure: equal keys are adjacent within a partition
    first = valid2d & jnp.concatenate(
        [jnp.ones((npart, 1), bool), key2d[:, 1:] != key2d[:, :-1]], axis=1)
    nxt = jnp.where(first, i2d, BIG)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
    next_first = jnp.concatenate([nxt[:, 1:], jnp.full((npart, 1), BIG, I32)], axis=1)
    run_count = jnp.minimum(next_first, part_len[:, None]) - i2d  # valid at `first` rows

    disp_first = jnp.where(first, pos - slot2d, 0)
    max_disp_seen = jnp.max(disp_first)
    ok = (~overflow_build) & (~overflow_pos) & (max_disp_seen < plan.max_disp)

    # invert placement: table slot t <- row j with pos[p, j] == t
    t2d = jnp.arange(table_pad, dtype=I32)[None, :]
    j_of_t = jax.vmap(jnp.searchsorted)(pos, jnp.broadcast_to(t2d, (npart, table_pad))).astype(I32)
    j_c = jnp.minimum(j_of_t, part_cap - 1)
    hit = (jnp.take_along_axis(pos, j_c, axis=1) == t2d) & \
        jnp.take_along_axis(valid2d, j_c, axis=1) & (j_of_t < part_cap)

    key_at = jnp.take_along_axis(key2d, j_c, axis=1)
    lo, hi = split_i64(key_at)
    cnt_at = jnp.where(jnp.take_along_axis(first, j_c, axis=1),
                       jnp.take_along_axis(run_count, j_c, axis=1), 0)
    p2d = jnp.arange(npart, dtype=I32)[:, None]
    return RHTables(
        plan=plan,
        t_key_lo=jnp.where(hit, lo.astype(I32), 0),
        t_key_hi=jnp.where(hit, hi.astype(I32), 0),
        t_count=jnp.where(hit, cnt_at, 0),
        t_rowflat=jnp.where(hit, p2d * part_cap + j_c, 0),
        b_rowid=rowid2d,
        b_valid=valid2d,
        ok=ok,
    )


# ---------------------------------------------------------------------------
# probe (Pallas): VMEM-resident table planes, D-round displacement walk
# ---------------------------------------------------------------------------

def _probe_kernel_factory(max_disp: int):
    # table refs are [1, 1, W] blocks; probe/out refs are [1, 8, W] blocks
    # (8 sublanes x W lanes of probes per grid step).
    def _probe_body(tk_lo, tk_hi, tcnt, q_lo, q_hi, home, out_pos, out_cnt):
        h = home[0]  # (8, W)
        ql = q_lo[0]
        qh = q_hi[0]
        rows = h.shape[0]
        tab_lo = jnp.broadcast_to(tk_lo[0], (rows, tk_lo.shape[2]))
        tab_hi = jnp.broadcast_to(tk_hi[0], (rows, tk_hi.shape[2]))
        tab_c = jnp.broadcast_to(tcnt[0], (rows, tcnt.shape[2]))
        pos = jnp.full(h.shape, -1, I32)
        cnt = jnp.zeros(h.shape, I32)
        for d in range(max_disp):
            t = h + d
            kl = jnp.take_along_axis(tab_lo, t, axis=1)
            kh = jnp.take_along_axis(tab_hi, t, axis=1)
            c = jnp.take_along_axis(tab_c, t, axis=1)
            m = (kl == ql) & (kh == qh) & (c > 0) & (pos < 0)
            pos = jnp.where(m, t, pos)
            cnt = jnp.where(m, c, cnt)
        out_pos[0] = pos
        out_cnt[0] = cnt

    def kernel(tk_lo, tk_hi, tcnt, q_lo, q_hi, home, out_pos, out_cnt):
        # x64 is enabled package-wide (int64 keys at the boundary), but
        # Mosaic has no 64-bit vectors: trace this kernel with x64 off so
        # take_along_axis builds int32 gather indices. All planes are i32.
        with jax.enable_x64(False):
            _probe_body(tk_lo, tk_hi, tcnt, q_lo, q_hi, home, out_pos, out_cnt)

    return kernel


def probe_rh_tables(tables: RHTables, s: Table, key: str = "key",
                    interpret: bool = False):
    """Partition the probe side and run the Pallas walk. Returns
    (pos [npart, probe_cap] — slot of first match or -1,
     cnt — run length, s_rowid — original S row per padded slot,
     s_valid, ok) — emission is the caller's (segment expansion)."""
    plan = tables.plan
    cap = s.capacity
    npart, probe_cap = plan.npart, plan.probe_cap

    sk = s.col(key)
    valid = s.valid_mask()
    bucket = jnp.where(valid, hash_keys(sk, plan.pbits, SALT_PART) if plan.pbits > 0
                       else jnp.zeros(cap, I32), npart)
    idx = jnp.arange(cap, dtype=I32)
    bucket = jax.lax.optimization_barrier(bucket)
    bucket_s, idx_s = jax.lax.sort((bucket, idx), num_keys=1, is_stable=True)
    starts = _partition_starts(bucket_s, npart)
    part_len = starts[1:] - starts[:-1]
    overflow_probe = jnp.any(part_len > probe_cap)

    rowid2d, valid2d = _padded_gather(idx_s, starts, npart, probe_cap)
    key2d = sk[rowid2d]
    lo, hi = split_i64(key2d)
    home2d = hash_keys(key2d, plan.table_bits, SALT_SLOT)

    w = plan.table_pad
    probe_rows = probe_cap // w  # total 8-sublane rows per partition
    grid = (npart, probe_rows // 8)
    tspec = pl.BlockSpec((1, 1, w), lambda p, t: (p, 0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 8, w), lambda p, t: (p, t, 0),
                         memory_space=pltpu.VMEM)

    def _t3(x):  # table planes [npart, w] -> [npart, 1, w]
        return x.reshape(x.shape[0], 1, x.shape[1])

    def _p3(x):  # probe planes [npart, probe_cap] -> [npart, rows, w]
        return x.reshape(x.shape[0], probe_rows, w)

    pos, cnt = pl.pallas_call(
        _probe_kernel_factory(plan.max_disp),
        grid=grid,
        in_specs=[tspec, tspec, tspec, pspec, pspec, pspec],
        out_specs=[pspec, pspec],
        out_shape=[jax.ShapeDtypeStruct((npart, probe_rows, w), I32)] * 2,
        interpret=interpret,
    )(_t3(tables.t_key_lo), _t3(tables.t_key_hi), _t3(tables.t_count),
      _p3(lo.astype(I32)), _p3(hi.astype(I32)), _p3(home2d))
    pos = pos.reshape(npart, probe_cap)
    cnt = cnt.reshape(npart, probe_cap)

    ok = tables.ok & (~overflow_probe)
    return pos, cnt, rowid2d, valid2d, ok


def rh_hash_join(r: Table, s: Table, out_capacity: int, key: str = "key",
                 plan: RHPlan | None = None, interpret: bool = False) -> Table:
    """Partitioned robin-hood hash join (the impl="rh" path of C6).

    Falls back wholesale to the sorted impl (lax.cond — only the taken
    branch executes) when any static capacity would be violated:
    partition overflow, placement overflow, displacement > D, or probe
    partition overflow.
    """
    from tpq.ops.hash_join import hash_join  # sorted fallback

    if plan is None:
        plan = plan_rh(r.capacity, s.capacity)
    # CPU backend (tests / 8-device sim) only supports Pallas interpret mode
    interpret = interpret or jax.default_backend() == "cpu"
    if not interpret and plan.table_pad > 128:
        # Mosaic's tpu.dynamic_gather cannot cross a 128-lane vreg
        # ("Multiple source vregs along gather dimension", measured on
        # v5e) — VMEM tables wider than one vreg cannot be probed with
        # the current kernel. Until the vreg-local bucket redesign
        # (home-lane-aligned probes + static rolls + sublane gather)
        # lands, compiled-TPU execution routes to the sorted impl, which
        # is the measured-fast path anyway (scripts/tpu_ops_bench.py).
        return hash_join(r, s, out_capacity, key=key, impl="sorted")

    tables = build_rh_tables(r, plan, key)
    pos, cnt, s_rowid2d, s_valid2d, ok = probe_rh_tables(tables, s, key, interpret)

    def rh_emit(_):
        counts_flat = jnp.where(s_valid2d, cnt, 0).reshape(-1)
        seg, rank, total, valid_out = expand_segments(counts_flat, out_capacity)
        p_of = seg // plan.probe_cap
        slot_pick = pos.reshape(-1)[seg] + rank
        tbl_flat = p_of * plan.table_pad + jnp.minimum(slot_pick, plan.table_pad - 1)
        rowflat = tables.t_rowflat.reshape(-1)[tbl_flat]
        r_rowid = tables.b_rowid.reshape(-1)[rowflat]
        s_rowid = s_rowid2d.reshape(-1)[seg]

        r_rowid = jnp.minimum(r_rowid, r.capacity - 1)
        s_rowid = jnp.minimum(s_rowid, s.capacity - 1)
        cols = {key: jnp.where(valid_out, s.col(key)[s_rowid], 0)}
        for name, col in r.columns.items():
            if name != key:
                cols[f"r_{name}"] = jnp.where(valid_out, col[r_rowid], 0)
        for name, col in s.columns.items():
            if name != key:
                cols[f"s_{name}"] = jnp.where(valid_out, col[s_rowid], 0)
        return Table(cols, total)

    def sorted_fallback(_):
        return hash_join(r, s, out_capacity, key=key, impl="sorted")

    return jax.lax.cond(ok, rh_emit, sorted_fallback, operand=None)
