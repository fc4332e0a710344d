"""Round-3b: record the merge path on the chip — both engines.

  * merge_radix: C5 Pallas LSD radix sort engine (one compiled split
    kernel reused for every pass; key_bits=20 because config-1's key
    domain is [0, 2^20) — pass count scales linearly for wider keys).
  * merge_lax: the one-shot multi-operand lax.sort engine (the default,
    faster per call but pathological compile).

Appends rows to bench_all_r3.json.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import jax

from tpq import datagen
from tpq.bench.timing import slope_time
from tpq.ops.merge_join import merge_join
from tpq.verify import multiset_checksum

N = 1 << 20
CAP = 1 << 22
r = datagen.gen_relation(N, N, payloads=1, seed=1)
s = datagen.gen_relation(N, N, payloads=1, seed=2)
jax.block_until_ready((r.columns, s.columns))

path = "/root/repo/bench_all_r3.json"
out = json.load(open(path)) if os.path.exists(path) else {}

rows = {}
for label, kwargs in (
        ("merge_radix_kb20", {"sort_engine": "radix", "key_bits": 20}),
        ("merge_lax", {}),
):
    f = jax.jit(lambda a, b, kw=kwargs: merge_join(a, b, CAP, **kw))
    res = f(r, s)
    jax.block_until_ready(res.columns)
    nrows = int(res.num_rows)
    csum = int(multiset_checksum(res))
    sec, _ = slope_time(f, (r, s), reps=2)
    rows[label] = {"elapsed_ms": round(sec * 1e3, 3), "rows": nrows,
                   "rows_per_sec": round(N / sec),
                   "checksum": hex(csum)}
    print(label, rows[label], flush=True)
    out["merge_single_chip_1m"] = rows
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=2, default=str)
print("saved", path, flush=True)
