"""Slope-timed per-phase breakdown of the sorted hash join at 1M x 1M —
where do the milliseconds actually go? (Run on the real chip:
`python scripts/tpu_phase_bench.py`.)"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tpq import datagen
from tpq.bench.timing import slope_time
from tpq.hashing import hash_keys
from tpq.ops import hash_join, merge_join
from tpq.ops._expand import searchsorted


def t(name, fn, *args, counts=(1, 2, 4, 8)):
    jfn = jax.jit(fn)
    sec, pts = slope_time(jfn, args, counts=counts)
    print(f"{name:34s} {sec * 1e3:9.3f} ms   pts={[(k, round(v * 1e3, 1)) for k, v in pts]}")
    return sec


def main():
    n = 1 << 20
    r = datagen.gen_relation(n, n, payloads=1, seed=1)
    s = datagen.gen_relation(n, n, payloads=1, seed=2)
    jax.block_until_ready((r.columns, s.columns))
    out_cap = 4 * n

    k = r.col("key")
    idx32 = jnp.arange(n, dtype=jnp.int32)

    t("hash 1M i64->i32", lambda x: hash_keys(x, 20), k)
    t("argsort 1M i64", jnp.argsort, k)
    t("sort pair (i64,i32)",
      lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True), k, idx32)
    t("sort 4ops (i64,3xi32)",
      lambda a, b: jax.lax.sort((a, b, b, b), num_keys=1, is_stable=True), k, idx32)
    t("gather 1M i64", lambda c, i: c[i], k, idx32)
    t("gather 4M i64", lambda c, i: c[i], k, jnp.arange(4 * n, dtype=jnp.int32) % n)
    t("searchsorted sort-method 1M/1M", lambda a, v: searchsorted(a, v), k, s.col("key"))
    t("cumsum 1M i32", jnp.cumsum, idx32)
    t("cumsum 4M i32", jnp.cumsum, jnp.arange(4 * n, dtype=jnp.int32))

    sk = s.col("key")
    t("searchsorted scan-method 1M/1M",
      lambda a, v: jnp.searchsorted(a, v, method="scan"), k, sk)
    t("concat+sort 2M (i64,i32)",
      lambda a, b, i: jax.lax.sort((jnp.concatenate([a, b]),
                                    jnp.concatenate([i, i])), num_keys=1,
                                   is_stable=True), k, sk, idx32)
    t("scatter-add 1M i32",
      lambda i: jnp.zeros(n, jnp.int32).at[i].add(1), hash_keys(k, 20))
    t("sort i32 1M pair",
      lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True),
      hash_keys(k, 31), idx32)
    t("cummax 4M i32", jax.lax.cummax, jnp.arange(4 * n, dtype=jnp.int32))

    t("hash_join sorted 1Mx1M",
      lambda a, b: hash_join(a, b, out_cap, impl="sorted"), r, s, counts=(1, 2, 4))
    t("merge_join 1Mx1M",
      lambda a, b: merge_join(a, b, out_cap), r, s, counts=(1, 2, 4))


if __name__ == "__main__":
    main()
