"""r5 probe B — which piece of the config-4 chunk aggregate stalls the
axon remote compiler? The staged pipeline isolated the stall to the
aggregate+accumulate program (probe+emit at 4M compiled; agg sat >17 min
in BOTH the i64-cumsum and the u32-plane-scan forms). Compile each
constituent at the exact bench shape (3,145,728 rows = out_cap of the
4M-chunk pipeline) with a per-piece wall clock.

Run: PYTHONUNBUFFERED=1 python scripts/tpu_r5_agg_bisect.py [--cap N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
I64 = jnp.int64
U32 = jnp.uint32


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed_compile(name, fn, args, budget_note=""):
    t0 = time.perf_counter()
    try:
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        log(f"  {name}: compile+run {dt:.1f}s {budget_note}")
        t1 = time.perf_counter()
        jax.block_until_ready(f(*args))
        log(f"    warm: {(time.perf_counter()-t1)*1e3:.1f} ms")
        return True
    except Exception as e:  # noqa: BLE001 - probe script
        log(f"  {name}: FAILED {type(e).__name__}: {e}")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=3145728)
    ap.add_argument("--only", default=None,
                    help="comma-separated piece names to run")
    args = ap.parse_args()
    cap = args.cap

    from tpq.columnar import Table
    from tpq.ops.hash_aggregate import _u64_cumsum_planes, hash_aggregate
    from tpq.ops.merge_join import sort_table_by_key
    from tpq.ops.union_join import col_planes, fill_forward

    log(f"gen fake join output ({cap} rows, key + 3 i64 value cols)…")
    rng = np.random.default_rng(0)
    n_live = int(cap * 0.67)
    cols = {
        "key": jnp.asarray(rng.integers(0, 1 << 19, cap), I64),
        "r_p0": jnp.asarray(rng.integers(0, 1 << 30, cap), I64),
        "s_p0": jnp.asarray(rng.integers(0, 1 << 30, cap), I64),
        "s_p1": jnp.asarray(rng.integers(0, 1 << 30, cap), I64),
    }
    t = Table(cols, n_live)
    jax.block_until_ready(t.columns)
    log("device ready; bisecting…")

    pieces = {}

    pieces["sort"] = (lambda tt: sort_table_by_key(tt, "key").col("key"), (t,))

    def rank_part(tt):
        ts = sort_table_by_key(tt, "key")
        k = ts.col("key")
        valid = ts.valid_mask()
        i = jnp.arange(cap, dtype=I32)
        is_start = valid & jnp.concatenate(
            [jnp.ones(1, bool), k[1:] != k[:-1]])
        nxt = jnp.concatenate([is_start[1:] | ~valid[1:], jnp.ones(1, bool)])
        is_end = valid & nxt
        rs = jax.lax.cummax(jnp.where(is_start, i, -1))
        return is_end, (i - rs + 1)

    pieces["sort+rank(cummax)"] = (rank_part, (t,))

    def one_scan(tt):
        lo, hi = col_planes(tt.col("r_p0"))
        return _u64_cumsum_planes(lo, hi)

    pieces["u64_scan_x1"] = (one_scan, (t,))

    def three_scans(tt):
        outs = []
        for n in ("r_p0", "s_p0", "s_p1"):
            lo, hi = col_planes(tt.col(n))
            outs.append(_u64_cumsum_planes(lo, hi))
        return outs

    pieces["u64_scan_x3"] = (three_scans, (t,))

    def i64_cumsum(tt):
        return jnp.cumsum(tt.col("r_p0"))

    pieces["i64_cumsum_x1"] = (i64_cumsum, (t,))

    def ff(tt):
        valid = tt.valid_mask()
        planes = [col_planes(tt.col(n))[j] for n in ("r_p0", "s_p0", "s_p1")
                  for j in range(2)]
        return fill_forward(valid, planes)

    pieces["fill_forward_6pl"] = (ff, (t,))

    def pack_piece(tt):
        from tpq.kernels.move import pack

        planes = [col_planes(tt.col(n))[j].astype(I32)
                  for n in ("key", "r_p0", "s_p0", "s_p1") for j in range(2)]
        occ = (tt.col("r_p0") & 1).astype(I32)
        return pack(planes + [jnp.zeros(cap, I32)] * 2, occ)

    pieces["pack_10pl"] = (pack_piece, (t,))

    def pad_piece(tt):
        from tpq.kernels.move import pad

        n_state = 1 << 19
        planes = [col_planes(tt.col(n))[j].astype(I32)
                  for n in ("r_p0", "s_p0", "s_p1") for j in range(2)]
        dest = jnp.minimum(jnp.arange(cap, dtype=I32), n_state)
        return pad(planes + [jnp.zeros(cap, I32)] * 2, dest,
                   jnp.int32(400000), n_state)

    pieces["pad_8pl_to_512k"] = (pad_piece, (t,))

    pieces["hash_aggregate_full"] = (
        lambda tt: hash_aggregate(tt, "key").col("count"), (t,))

    only = set(args.only.split(",")) if args.only else None
    for name, (fn, fargs) in pieces.items():
        if only and name not in only:
            continue
        timed_compile(name, fn, fargs)

    log("done")


if __name__ == "__main__":
    main()
