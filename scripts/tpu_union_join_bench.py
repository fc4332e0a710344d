"""Timing of the new union-sort join at 1M x 1M on the real chip."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from tpq import datagen
from tpq.bench.timing import slope_time
from tpq.ops import hash_join, merge_join
from tpq.ops.union_join import union_join


def t(name, fn, *args, counts=(1, 2, 4)):
    jfn = jax.jit(fn)
    sec, pts = slope_time(jfn, args, counts=counts)
    print(f"{name:38s} {sec * 1e3:9.3f} ms   pts={[(k, round(v * 1e3, 1)) for k, v in pts]}")
    return sec


def main():
    n = 1 << 20
    r = datagen.gen_relation(n, n, payloads=1, seed=1)
    s = datagen.gen_relation(n, n, payloads=1, seed=2)
    jax.block_until_ready((r.columns, s.columns))
    out_cap = 4 * n

    t("union_join 1Mx1M dmax=2", lambda a, b: union_join(a, b, out_cap, dmax=2), r, s)
    t("union_join 1Mx1M dmax=3", lambda a, b: union_join(a, b, out_cap, dmax=3), r, s)
    t("union_join 1Mx1M dmax=2 cap=2M",
      lambda a, b: union_join(a, b, 2 * n, dmax=2), r, s)
    t("hash_join (new) 1Mx1M", lambda a, b: hash_join(a, b, out_cap), r, s)

    out = jax.jit(lambda a, b: union_join(a, b, out_cap))(r, s)
    print("num_rows:", int(out.num_rows))


if __name__ == "__main__":
    main()
