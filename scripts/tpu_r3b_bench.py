"""Round-3b: measure the slimmed lane join (1-key composite build sort,
lane-free probe sort, windowed tail splice) on the chip, record configs
1+3 for the bench report, and warm the driver's .jaxcache."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import jax

from tpq.bench import roofline
from tpq.bench.runner import phase_report, run_config
from tpq.config import PRESETS

hbm = roofline.measure_hbm_bw(size_mb=256, iters=5)
print(f"HBM {hbm:.0f} GB/s", flush=True)

out = {}
for name in ("single_chip_1m", "zipf_skew"):
    rep = run_config(PRESETS[name], hbm_bw=hbm)
    out[name] = rep
    op = rep["ops"][0]
    print(name, op["op"], round(op["elapsed_ms"], 2), "ms",
          round(op["roofline_pct"], 3), "% roofline",
          f"{op['rows_per_sec']:.3e} rows/s", flush=True)
    with open("/root/repo/bench_all_r3.json", "w") as f:
        json.dump(out, f, indent=2, default=str)

out["phases_single_chip_1m"] = phase_report(PRESETS["single_chip_1m"], hbm)
for row in out["phases_single_chip_1m"]:
    print(f"  {row['phase']:28s} {row['ms']:9.3f} ms", flush=True)
with open("/root/repo/bench_all_r3.json", "w") as f:
    json.dump(out, f, indent=2, default=str)
print("saved bench_all_r3.json", flush=True)
