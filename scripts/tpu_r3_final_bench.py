"""End-of-round: warm the driver bench caches and record configs 1+3."""
import sys, os, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")
from tpq.bench import roofline
from tpq.bench.runner import run_config
from tpq.config import PRESETS

hbm = roofline.measure_hbm_bw(size_mb=256, iters=5)
print(f"HBM {hbm:.0f} GB/s", flush=True)
out = {}
for name in ("single_chip_1m", "zipf_skew"):
    rep = run_config(PRESETS[name], hbm_bw=hbm)
    out[name] = rep
    print(name, rep["ops"][0]["op"], round(rep["ops"][0]["elapsed_ms"], 2), "ms",
          round(rep["ops"][0]["roofline_pct"], 3), "% roofline", flush=True)
with open("/root/repo/bench_all_r3.json", "w") as f:
    json.dump(out, f, indent=2, default=str)
print("saved bench_all_r3.json", flush=True)
