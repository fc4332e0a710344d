"""Benchmark relation generation — Python twin of oracle/datagen.cc (N4).

Seed-stable contract (SURVEY.md §4.4.3): for identical (seed, rows, nkeys,
payloads, theta) this module and the C++ oracle produce byte-identical
column streams. The shared primitive is splitmix64 applied to a counter —
no stateful RNG, so both sides are trivially order-independent and
parallelizable.

Relations (BASELINE.json:L7-L9):
  * uniform: keys = splitmix64(seed, i) % nkeys
  * zipf(theta): rank sampled by inverse-CDF over 1/rank^theta (double
    precision, summed in index order in both languages -> bit-identical),
    key value = rank.
  * payload col j: splitmix64(seed ^ PAYLOAD_SALT, i * ncols + j), masked
    to non-negative int64.

Columns are named "key", "p0".."p{P-1}" — this order is the canonical
column order for oracle comparison.
"""

from __future__ import annotations

import numpy as np

from tpq.columnar import Table

PAYLOAD_SALT = 0xA5A5A5A5DEADBEEF
GOLDEN = 0x9E3779B97F4A7C15


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based splitmix64; x is uint64 array."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(GOLDEN)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _stream(seed: int, idx: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(np.uint64(seed) ^ (idx.astype(np.uint64) * np.uint64(0xD1342543DE82EF95)))


_NATIVE_THRESHOLD = 1 << 22  # below this numpy is fast enough


def uniform_keys(rows: int, nkeys: int, seed: int) -> np.ndarray:
    if rows >= _NATIVE_THRESHOLD:
        from tpq import native

        out = native.gen_uniform(rows, nkeys, seed)
        if out is not None:
            return out
    idx = np.arange(rows, dtype=np.uint64)
    r = _stream(seed, idx)
    return (r % np.uint64(nkeys)).astype(np.int64)


def zipf_cdf(nkeys: int, theta: float) -> np.ndarray:
    """Cumulative weights of 1/rank^theta, rank=1..nkeys, float64, summed in
    index order (both languages do exactly this loop order)."""
    ranks = np.arange(1, nkeys + 1, dtype=np.float64)
    w = ranks ** (-np.float64(theta))
    return np.cumsum(w)


def zipf_keys(rows: int, nkeys: int, theta: float, seed: int) -> np.ndarray:
    if rows >= _NATIVE_THRESHOLD:
        from tpq import native

        out = native.gen_zipf(rows, nkeys, theta, seed)
        if out is not None:
            return out
    cdf = zipf_cdf(nkeys, theta)
    total = cdf[-1]
    idx = np.arange(rows, dtype=np.uint64)
    r = _stream(seed, idx)
    # 53-bit uniform double in [0, 1)
    u = (r >> np.uint64(11)).astype(np.float64) * (1.0 / 9007199254740992.0)
    target = u * total
    # first index where cdf[k] > target  (C++: std::upper_bound)
    k = np.searchsorted(cdf, target, side="right")
    return np.minimum(k, nkeys - 1).astype(np.int64)


def payload_cols(rows: int, ncols: int, seed: int) -> dict[str, np.ndarray]:
    out = {}
    native_mod = None
    if rows >= _NATIVE_THRESHOLD:
        from tpq import native as native_mod

    idx = None
    for j in range(ncols):
        if native_mod is not None:
            col = native_mod.gen_payload(rows, ncols, j, seed)
            if col is not None:
                out[f"p{j}"] = col
                continue
        if idx is None:
            idx = np.arange(rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            r = _stream(seed ^ PAYLOAD_SALT, idx * np.uint64(ncols) + np.uint64(j))
        out[f"p{j}"] = (r >> np.uint64(1)).astype(np.int64)  # non-negative
    return out


def gen_relation_np(
    rows: int,
    nkeys: int,
    payloads: int = 1,
    seed: int = 0,
    kind: str = "uniform",
    theta: float = 1.0,
) -> dict[str, np.ndarray]:
    if kind == "uniform":
        keys = uniform_keys(rows, nkeys, seed)
    elif kind == "zipf":
        keys = zipf_keys(rows, nkeys, theta, seed)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    cols = {"key": keys}
    cols.update(payload_cols(rows, payloads, seed))
    return cols


def gen_relation(
    rows: int,
    nkeys: int,
    payloads: int = 1,
    seed: int = 0,
    kind: str = "uniform",
    theta: float = 1.0,
    capacity: int | None = None,
) -> Table:
    return Table.from_numpy(gen_relation_np(rows, nkeys, payloads, seed, kind, theta), capacity)


# ---------------------------------------------------------------------------
# device-side twins (SURVEY.md §4.4.3 seed-stable contract) — config-2/4
# scale relations are generated ON the chip: 100M-row columns are ~GBs
# that would otherwise cross the host tunnel per run. Byte-identical to
# the numpy/native streams (tests/test_core.py::test_device_datagen).
# ---------------------------------------------------------------------------

def _splitmix64_dev(x):
    import jax.numpy as jnp

    z = (x + jnp.uint64(GOLDEN)).astype(jnp.uint64)
    z = (z ^ (z >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return z ^ (z >> jnp.uint64(31))


def _stream_dev(seed: int, idx):
    import jax.numpy as jnp

    return _splitmix64_dev(jnp.uint64(seed)
                           ^ (idx.astype(jnp.uint64)
                              * jnp.uint64(0xD1342543DE82EF95)))


def gen_relation_device(rows: int, nkeys: int, payloads: int = 1,
                        seed: int = 0, capacity: int | None = None,
                        row_offset: int = 0) -> Table:
    """Uniform relation generated on-device, byte-identical to
    gen_relation(kind="uniform"). `row_offset` yields the global rows
    [row_offset, row_offset + rows) of the stream — the chunked
    config-2/4 benches generate each probe chunk in place."""
    import jax.numpy as jnp

    from tpq.columnar import next_pow2

    cap = capacity or next_pow2(rows)
    idx = (jnp.arange(cap, dtype=jnp.uint64)
           + jnp.asarray(row_offset, jnp.uint64))  # offset may be traced
    keys = (_stream_dev(seed, idx) % jnp.uint64(nkeys)).astype(jnp.int64)
    cols = {"key": keys}
    for j in range(payloads):
        r = _stream_dev(seed ^ PAYLOAD_SALT,
                        idx * np.uint64(payloads) + np.uint64(j))
        cols[f"p{j}"] = (r >> jnp.uint64(1)).astype(jnp.int64)
    return Table(cols, rows)
