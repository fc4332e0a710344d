"""Driver-facing benchmark entry (run on real TPU hardware each round).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline (BASELINE.json:L2): single-chip equi-join throughput on the
config-1 relation pair (uniform int64 1M x 1M, 1 payload col), probe-side
rows/s. The reference has no retrievable published numbers
(BASELINE.json:L13 "published": {}; BASELINE.md row 1), so vs_baseline is
defined against the binding acceptance target instead: the derived
speed-of-light join time from the measured HBM bandwidth x 80%
(BASELINE.md rows 3/9/10). vs_baseline >= 1.0 means the north-star
single-chip target is met.

Everything else (per-op table, HBM BW) goes to stderr.
"""

import json
import os
import sys

# Multi-operand lax.sort programs take minutes of XLA:TPU compile time
# (measured 645 s for the 5-operand stable build sort, warm exec 5 ms);
# the persistent cache makes every rerun of this entry near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jaxcache"))


def main():
    from tpq.bench import roofline
    from tpq.bench.runner import run_config
    from tpq.config import PRESETS

    hbm_bw = roofline.measure_hbm_bw(size_mb=256, iters=5)
    print(f"measured HBM BW: {hbm_bw:.0f} GB/s", file=sys.stderr)

    cfg = PRESETS["single_chip_1m"]
    report = run_config(cfg, hbm_bw=hbm_bw)
    op = report["ops"][0]
    for line in json.dumps(report, indent=2, default=str).splitlines():
        print(line, file=sys.stderr)

    rows_per_sec = op["rows_per_sec"]
    # acceptance: >= 80% of the byte-model speed-of-light for this config
    sol_rows_per_sec = op["rows"] / (op["sol_ms"] / 1e3)
    vs_baseline = rows_per_sec / (0.8 * sol_rows_per_sec)
    print(json.dumps({
        "metric": "hash_join_probe_rows_per_sec_1chip",
        "value": round(rows_per_sec),
        "unit": "rows/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
