"""Chip profiler-trace artifact (VERDICT r3 item 7a; BASELINE.json:L5
"exchange overlapped with build/probe compute via double-buffered
pipelines"): captures an xprof trace of

  (a) the config-1 lane join (named phases), and
  (b) the chunked distributed join on the degenerate 1-chip mesh —
      the only executable form of the exchange on this box; the trace
      records the per-chunk exchange/probe dependency structure XLA
      schedules (on a real slice the same program's collectives overlap
      hop t's wire with hop t-1's probe).

Output: artifacts/trace_r4/ (xprof protobufs, checked in as the round's
overlap/trace evidence).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import jax

from tpq import datagen
from tpq.bench.timing import force_sync
from tpq.ops import hash_join
from tpq.trace import annotate, trace_if

OUT = "/root/repo/artifacts/trace_r4"

r = datagen.gen_relation(1 << 20, 1 << 20, payloads=1, seed=1)
s = datagen.gen_relation(1 << 20, 1 << 20, payloads=1, seed=2)
join = jax.jit(lambda a, b: hash_join(a, b, 1 << 22))
force_sync(join(r, s))  # compile off-trace

# chunked build-once/probe-many: re-run the config-2 sweep machinery at
# 2 chunks — byte-identical HLO to the recorded artifacts/bench_r4_config2
# run, so every executable is a persistent-cache hit and the trace shows
# how XLA interleaves chunk i+1's on-device gen with chunk i's probe
from tpq.bench.scale_bench import bench_build_sweep

with trace_if(OUT):
    with annotate("config1_lane_join"):
        force_sync(join(r, s))
    with annotate("chunked_gen_probe_x2"):
        bench_build_sweep(n_probe=2 * (1 << 24), verify=False,
                          hbm_bw=650.0, log=lambda *_: None)
print("trace written to", OUT)
for root, _, files in os.walk(OUT):
    for f in files:
        print(" ", os.path.join(root, f)[len(OUT) + 1:])
