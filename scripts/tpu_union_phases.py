"""Per-phase slope timing of union_join at config-1 shapes (1M x 1M,
1 i64 payload each side) — which sort actually costs the 100 ms?"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tpq import datagen
from tpq.bench.timing import slope_time
from tpq.ops._expand import expand_segments
from tpq.ops.union_join import fill_forward, union_join

I32 = jnp.int32


PHASES = set(sys.argv[1]) if len(sys.argv) > 1 else set("ABCDEFGHI")


def t(name, fn, *args):
    if name[0] not in PHASES:
        return None
    jfn = jax.jit(fn)
    sec, pts = slope_time(jfn, args, reps=1, noise_floor=0.025, max_seconds=45)
    print(f"{name:44s} {sec * 1e3:9.3f} ms", flush=True)
    return sec


def main():
    n = 1 << 20
    u = 2 * n
    dmax = 2
    tail_out_cap = max(2048, min(4 * n, u >> 3))
    out_capacity = 4 * n
    r = datagen.gen_relation(n, n, payloads=1, seed=1)
    s = datagen.gen_relation(n, n, payloads=1, seed=2)
    jax.block_until_ready((r.columns, s.columns))

    k2 = jnp.concatenate([r.col("key"), s.col("key")])
    inv = jnp.zeros(u, I32)
    side = jnp.concatenate([jnp.zeros(n, I32), jnp.ones(n, I32)])
    planes4 = tuple(jnp.zeros(u, jnp.uint32) + jnp.uint32(i) for i in range(4))

    # A: the union sort as written (i64 key operand)
    t("A union sort i64key +4planes (2M)",
      lambda i_, k_, s_, *p: jax.lax.sort((i_, k_, s_, *p), num_keys=3,
                                          is_stable=True), inv, k2, side, *planes4)

    # B: key as two i32 planes (hi signed, lo biased)
    khi = (k2 >> 32).astype(I32)
    klo = (k2.astype(jnp.uint32).astype(jnp.int64) - (1 << 31)).astype(I32)
    t("B union sort 2xi32key +4planes (2M)",
      lambda i_, h_, l_, s_, *p: jax.lax.sort((i_, h_, l_, s_, *p), num_keys=4,
                                              is_stable=True), inv, khi, klo, side, *planes4)

    # C: run-structure scans on 2M
    def scans(k_s, side_s):
        valid = jnp.ones(u, bool)
        is_r = (side_s == 0)
        is_s = (side_s == 1)
        i = jnp.arange(u, dtype=I32)
        nr = jnp.concatenate([jnp.ones(1, bool), k_s[1:] != k_s[:-1]])
        cr_ex = jnp.cumsum(is_r.astype(I32)) - is_r.astype(I32)
        base = jax.lax.cummax(jnp.where(nr, cr_ex, -1))
        m = cr_ex - base
        rs = jax.lax.cummax(jnp.where(nr, i, -1))
        m_s = jnp.where(is_s, m, 0)
        return m_s, rs, jnp.sum(m_s.astype(jnp.int64))
    t("C run-structure scans (2M)", scans, k2, side)

    # D: fill-forward scan, dmax*r_planes = 4 planes at 2M
    nr0 = jnp.arange(u) % 2 == 0
    t("D fill_forward 4 planes (2M)",
      lambda nr_, *p: fill_forward(nr_, list(p)), nr0, *planes4)

    # E: tail — flag sort + expand + small gathers
    def tail(m_s, rs):
        i = jnp.arange(u, dtype=I32)
        flag = jnp.where(m_s > dmax, 0, 1).astype(I32)
        _, idx_t = jax.lax.sort((flag, i), num_keys=1, is_stable=True)
        idx_t = idx_t[:u >> 4]
        counts = jnp.maximum(m_s[idx_t] - dmax, 0)
        seg, rank, _, vout = expand_segments(counts, tail_out_cap)
        pos = jnp.minimum(rs[idx_t][seg] + rank, u - 1)
        outs = tuple(p[pos] for p in planes4)
        return outs, vout
    msx = (jnp.arange(u, dtype=I32) % 7)
    rsx = jnp.arange(u, dtype=I32)
    t("E tail sort+expand+gathers", tail, msx, rsx)

    # F: final compaction sort, 1 i32 key + 6 planes, dmax*u + tail len
    L = dmax * u + tail_out_cap
    sk = (jnp.arange(L, dtype=I32) % 3 == 0).astype(I32)
    p6 = tuple(jnp.zeros(L, jnp.uint32) + jnp.uint32(i) for i in range(6))
    t(f"F final sort 1key+6planes ({L/1e6:.2f}M)",
      lambda s_, *p: jax.lax.sort((s_, *p), num_keys=1, is_stable=True), sk, *p6)

    # G: same at dmax=1 length
    L1 = u + 4 * tail_out_cap
    sk1 = (jnp.arange(L1, dtype=I32) % 3 == 0).astype(I32)
    p61 = tuple(jnp.zeros(L1, jnp.uint32) + jnp.uint32(i) for i in range(6))
    t(f"G final sort 1key+6planes ({L1/1e6:.2f}M)",
      lambda s_, *p: jax.lax.sort((s_, *p), num_keys=1, is_stable=True), sk1, *p61)

    # H: full union_join today
    t("H union_join dmax=2 (full)",
      lambda r_, s_: union_join(r_, s_, out_capacity), r, s)

    # I: dmax=1 with fat tail caps
    t("I union_join dmax=1 tail=1M",
      lambda r_, s_: union_join(r_, s_, out_capacity, dmax=1,
                                tail_rows_cap=1 << 19, tail_out_cap=1 << 20), r, s)


if __name__ == "__main__":
    main()
