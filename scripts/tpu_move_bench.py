"""Compiled PAD/PACK rates on the chip (move.py twins of test_move.py)."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
import tpq
from tpq.kernels.move import pad, pack
from tpq.bench.timing import slope_time

rng = np.random.default_rng(0)
N = 1 << 21
for nplanes, rows in ((2, 16), (6, 16), (6, 32)):
    occ = (rng.random(N) < 0.6).astype(np.int32)
    planes = [jnp.asarray(rng.integers(1, 1 << 30, size=N).astype(np.int32))
              for _ in range(nplanes)]
    occ_j = jnp.asarray(occ)
    f = jax.jit(lambda o, *ps: pack(list(ps), o, rows=rows))
    outs, total = jax.block_until_ready(f(occ_j, *planes))
    k = int(occ.sum())
    assert int(total) == k
    want = np.asarray(planes[0])[occ.astype(bool)]
    np.testing.assert_array_equal(np.asarray(outs[0])[:k], want)
    sec, _ = slope_time(f, (occ_j, *planes), reps=2)
    print(f"PACK rows={rows} nplanes={nplanes} {N/1e6:.1f}M: {sec*1e3:8.3f} ms "
          f"({N/sec/1e9:6.2f} G rows/s, {(nplanes)*4*2*N/sec/1e9:7.1f} GB/s)", flush=True)

n_live = int(N * 0.6)
for nplanes, rows in ((2, 16), (5, 16), (5, 32)):
    dest = np.sort(rng.choice(N, size=n_live, replace=False)).astype(np.int32)
    planes = [jnp.asarray(rng.integers(1, 1 << 30, size=n_live).astype(np.int32))
              for _ in range(nplanes)]
    dj = jnp.asarray(dest)
    f = jax.jit(lambda d, *ps: pad(list(ps), d, n_live, N, rows=rows))
    outs, occo = jax.block_until_ready(f(dj, *planes))
    want = np.zeros(N, np.int32); want[dest] = np.asarray(planes[0])
    np.testing.assert_array_equal(np.asarray(outs[0]), want)
    sec, _ = slope_time(f, (dj, *planes), reps=2)
    print(f"PAD  rows={rows} nplanes={nplanes} {N/1e6:.1f}M out: {sec*1e3:8.3f} ms "
          f"({N/sec/1e9:6.2f} G slots/s, {(nplanes)*4*2*N/sec/1e9:7.1f} GB/s)", flush=True)
