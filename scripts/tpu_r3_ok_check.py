"""Is the lane path actually taken at config-1 scale? Print every ok
component (build depth, probe partition, tail caps)."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from tpq import datagen
from tpq.kernels.lane_table import (plan_lane, build_lane_tables,
                                    fused_probe_emit_planes)

N = 1 << 20
CAP = 1 << 22
r = datagen.gen_relation(N, N, payloads=1, seed=1)
s = datagen.gen_relation(N, N, payloads=1, seed=2)
plan = plan_lane(N, N, out_capacity=CAP)
print("plan:", plan, flush=True)
K = plan.inline_k


@jax.jit
def check(r, s):
    tables = build_lane_tables(r, plan)
    (out_planes, cnt, d_first, qk_p, spay_p, qocc, lane_p,
     probe_ovf) = fused_probe_emit_planes(tables, s, CAP)
    live_q = qocc > 0
    cnt_eff = jnp.where(live_q, cnt, 0)
    total64 = jnp.sum(cnt_eff.astype(jnp.int64))
    inline64 = jnp.sum(jnp.minimum(cnt_eff, K).astype(jnp.int64))
    tail_rows = jnp.sum((cnt_eff > K).astype(jnp.int32))
    tail_out = total64 - inline64
    return (tables.ok, probe_ovf, tail_rows, tail_out, total64, inline64,
            jnp.max(cnt_eff))


ok_b, probe_ovf, tail_rows, tail_out, total, inline, maxcnt = \
    [np.asarray(x) for x in check(r, s)]
print(f"build ok={ok_b} probe_ovf={probe_ovf} tail_rows={tail_rows} "
      f"(cap {plan.tail_rows_cap}) tail_out={tail_out} (cap {plan.tail_out_cap}) "
      f"total={total} inline={inline} maxcnt={maxcnt}", flush=True)
