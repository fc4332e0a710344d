"""Probe the primitive costs of the gather-free union-sort join design
(run on the real chip). Decides Dmax / fill-forward realization."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tpq.bench.timing import slope_time

I32 = jnp.int32


def t(name, fn, *args, counts=(1, 2, 4, 8)):
    jfn = jax.jit(fn)
    sec, pts = slope_time(jfn, args, counts=counts)
    print(f"{name:40s} {sec * 1e3:9.3f} ms   pts={[(k, round(v * 1e3, 1)) for k, v in pts]}")
    return sec


def ff_scan(valid, *planes):
    def comb(a, b):
        av, bv = a[0], b[0]
        out = [av | bv]
        for ax, bx in zip(a[1:], b[1:]):
            out.append(jnp.where(bv, bx, ax))
        return tuple(out)

    res = jax.lax.associative_scan(comb, (valid, *planes))
    return res[1:]


def ff_pack(valid, plane_u32, idx):
    """Fill-forward one u32 plane via packed i64 cummax."""
    packed = jnp.where(valid, (idx.astype(jnp.int64) << 32) | plane_u32.astype(jnp.uint32).astype(jnp.int64),
                       jnp.int64(-1))
    filled = jax.lax.cummax(packed)
    return (filled & 0xFFFFFFFF).astype(jnp.uint32).astype(jnp.int32)


def main():
    n = 1 << 21  # union size for 1M x 1M
    key = jax.random.PRNGKey(0)
    k64 = jax.random.randint(key, (n,), 0, 1 << 40, dtype=jnp.int64)
    a = jax.random.randint(key, (n,), 0, 1 << 30, dtype=I32)
    b = a ^ 123
    valid = (a & 7) == 0
    idx = jnp.arange(n, dtype=I32)
    jax.block_until_ready((k64, a, b, valid))

    t("assoc_scan ff 1+2 planes 2M", lambda v, x, y: ff_scan(v, x, y), valid, a, b)
    t("assoc_scan ff 1+5 planes 2M",
      lambda v, x, y: ff_scan(v, x, y, x, y, x), valid, a, b)
    t("ff_pack cummax 1 plane 2M", ff_pack, valid, a, idx)
    t("cummax i64 2M", jax.lax.cummax, k64)
    t("roll 2M", lambda x: jnp.roll(x, -3), a)
    t("union sort 2M 8planes(i64+6xi32)",
      lambda k, *ps: jax.lax.sort((k, *ps), num_keys=2, is_stable=True),
      k64, a, b, a, b, a, b)
    t("compact sort 4M x 6 i32",
      lambda m, *ps: jax.lax.sort((m, *ps), num_keys=1, is_stable=True),
      jnp.concatenate([a, b]) & 1, *(jnp.concatenate([x, x]) for x in (a, b, a, b, a)))
    small = jnp.arange(n // 8, dtype=I32) * 7 % n
    t("gather 256K idx from 2M i32", lambda c, i: c[i], a, small)
    t("gather 256K idx from 2M i64", lambda c, i: c[i], k64, small)
    t("cumsum 2M i32", jnp.cumsum, a)
    t("i64 neighbor compare 2M", lambda x: x[1:] != x[:-1], k64)


if __name__ == "__main__":
    main()
