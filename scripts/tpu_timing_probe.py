import time, jax, jax.numpy as jnp, numpy as np

def slope_time(f, x, counts=(2, 4, 8, 16), reps=3):
    """True per-iteration seconds via linear fit over chained-iteration counts.
    f must be shape-preserving and jitted. Returns (sec/iter, details)."""
    y = jax.block_until_ready(f(x))
    _ = np.asarray(jax.device_get(y if y.ndim == 0 else y.ravel()[0]))  # warm readback
    pts = []
    for k in counts:
        best = float('inf')
        for _ in range(reps):
            y = f(x)
            t0 = time.perf_counter()
            for _ in range(k): y = f(y)
            jax.block_until_ready(y)
            _ = np.asarray(y.ravel()[0] if y.ndim else y)
            best = min(best, time.perf_counter() - t0)
        pts.append((k, best))
    ks = np.array([p[0] for p in pts], float); ts = np.array([p[1] for p in pts], float)
    slope = np.polyfit(ks, ts, 1)[0]
    return slope, pts

n = 256 * 1024 * 1024 // 4
x = jnp.arange(n, dtype=jnp.float32)
f = jax.jit(lambda x: x * 1.0000001 + 1.0)
s, pts = slope_time(f, x)
print(f"stream 256MB: {s*1e3:.3f} ms/iter -> {2*n*4/s/1e9:.0f} GB/s   pts={[(k, round(t*1e3,2)) for k,t in pts]}")

a = jnp.ones((8192, 8192), jnp.bfloat16)
g = jax.jit(lambda a: a @ a * jnp.bfloat16(0.5))
s, pts = slope_time(g, a)
print(f"matmul 8192 bf16: {s*1e3:.3f} ms/iter -> {2*8192**3/s/1e12:.1f} TFLOP/s   pts={[(k, round(t*1e3,2)) for k,t in pts]}")
