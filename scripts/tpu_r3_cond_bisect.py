"""Bisect the ~100 ms 'other' in lane_hash_join e2e: phases sum to 19 ms
but the composed jit runs 120 ms. Suspects: the fallback lax.cond, XLA
fusion across phase boundaries, or the union_join branch."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from tpq import Table, datagen
from tpq.bench.timing import slope_time
from tpq.kernels.lane_table import (plan_lane, build_lane_tables,
                                    lane_probe_emit)
from tpq.ops._expand import barrier

N = 1 << 20
CAP = 1 << 22
r = datagen.gen_relation(N, N, payloads=1, seed=1)
s = datagen.gen_relation(N, N, payloads=1, seed=2)
jax.block_until_ready((r.columns, s.columns))
plan = plan_lane(N, N, out_capacity=CAP)


def t(name, fn, *args, reps=2):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    sec, _ = slope_time(f, args, reps=reps)
    print(f"{name:46s} {sec*1e3:9.3f} ms", flush=True)
    return sec


def build_pe(a, b):
    tables = build_lane_tables(a, plan)
    out, ok = lane_probe_emit(tables, b, CAP)
    return out, ok

t("A: build+probe_emit, no cond", lambda a, b: build_pe(a, b)[0], r, s)


def with_zero_fallback(a, b):
    out, ok = build_pe(a, b)

    def keep(_):
        return out

    def zfall(_):
        return Table({k: jnp.zeros_like(v) for k, v in out.columns.items()},
                     out.num_rows)

    return jax.lax.cond(ok, keep, zfall, operand=None)

t("B: + cond(zero fallback)", with_zero_fallback, r, s)


def with_union_fallback(a, b):
    from tpq.ops.union_join import union_join
    out, ok = build_pe(a, b)

    def keep(_):
        return out

    def fall(_):
        return union_join(a, b, CAP)

    return jax.lax.cond(ok, keep, fall, operand=None)

t("C: + cond(union fallback)", with_union_fallback, r, s)


def with_union_fallback_barrier(a, b):
    from tpq.ops.union_join import union_join
    out, ok = build_pe(a, b)
    out, ok = barrier((out, ok))

    def keep(_):
        return out

    def fall(_):
        return union_join(a, b, CAP)

    return jax.lax.cond(ok, keep, fall, operand=None)

t("D: + barrier before cond(union)", with_union_fallback_barrier, r, s)
print("done", flush=True)
