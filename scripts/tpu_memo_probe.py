import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from tpq.bench.timing import force_sync

n = 64 * 1024 * 1024 // 4
f = jax.jit(lambda x: x * 1.0000001 + 1.0)
x = jnp.arange(n, dtype=jnp.float32)
print("warming...", flush=True)
force_sync(f(x))
print("warm done", flush=True)

def run(label, mk):
    for k in (4, 16):
        force_sync(f(x))
        t0 = time.perf_counter()
        o = mk(k)
        force_sync(o)
        dt = time.perf_counter() - t0
        print(f"{label} k={k}: {dt*1e3:8.2f} ms  ({2*n*4*k/dt/1e9:.0f} GB/s)", flush=True)

def mkA(k):
    o = None
    for _ in range(k): o = f(x)
    return o
run("identical-args ", mkA)

def mkB(k):
    o = x
    for _ in range(k): o = f(o)
    return o
run("chained        ", mkB)

xs = [jnp.arange(n, dtype=jnp.float32) + i for i in range(4)]
jax.block_until_ready(xs)
def mkC(k):
    o = None
    for i in range(k): o = f(xs[i % 4])
    return o
run("cycled-buffers ", mkC)
