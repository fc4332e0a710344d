"""D4 — heavy-hitter skew detection + key-splitting (SURVEY.md §2.2 D4;
BASELINE.json:L5 "heavy-hitter skew detection and key-splitting").

Zipf-skewed keys (config 3, theta=1.0) concentrate on few keys; a pure
hash exchange lands all their rows on one owner chip. The split:

  * DETECT: each shard aggregates a local key histogram, nominates its
    top-H candidates, all-gathers them, then counts every candidate
    EXACTLY on all shards (searchsorted over locally sorted keys — no
    scatter) and psums to global counts. Sample-free and deterministic.
  * SPLIT: rows whose key is heavy are excluded from the hash exchange.
    Heavy BUILD rows are replicated to every chip (all_gather);
    heavy PROBE rows stay on their origin chip and join against the
    replica. Every matching pair is produced exactly once: heavy pairs
    on the probe row's origin chip, light pairs on the key's owner chip.

This is the expert-parallel analog of the checklist (keys->chips routing
with capacity overflow and hot-expert replication, SURVEY.md §2.2).
All functions run inside a shard_map body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpq.columnar import Table
from tpq.ops.filter import compact
from tpq.ops.merge_join import I64_MAX


def _count_keys_in(sorted_keys: jnp.ndarray, n_valid, queries: jnp.ndarray) -> jnp.ndarray:
    """Exact occurrence count of each query key in a locally sorted column
    (padding sorted to the end as I64_MAX and clamped out)."""
    lo = jnp.searchsorted(sorted_keys, queries, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(sorted_keys, queries, side="right").astype(jnp.int32)
    return jnp.minimum(hi, n_valid) - jnp.minimum(lo, n_valid)


def detect_heavy_keys(
    r_keys_sorted: jnp.ndarray, r_n,
    s_keys_sorted: jnp.ndarray, s_n,
    axis: str, candidates_per_shard: int, threshold: int,
):
    """Returns (heavy_keys i64[nchips*2*candidates_per_shard] — sorted,
    padded with I64_MAX, deduplicated; mask of real entries). A key is
    heavy if its GLOBAL count on either side exceeds `threshold`."""

    def nominate(k, n, h):
        # run-length top-h on locally sorted keys
        cap = k.shape[0]
        is_start = jnp.concatenate([jnp.ones(1, bool), k[1:] != k[:-1]])
        run_len = _count_keys_in(k, n, k)  # count of each row's own key
        cand_score = jnp.where(is_start & (jnp.arange(cap) < n), run_len, -1)
        top = jnp.argsort(-cand_score)[:h]
        return jnp.where(cand_score[top] > 0, k[top], I64_MAX)

    local_cand = jnp.concatenate([
        nominate(r_keys_sorted, r_n, candidates_per_shard),
        nominate(s_keys_sorted, s_n, candidates_per_shard),
    ])
    all_cand = jax.lax.all_gather(local_cand, axis, tiled=True)  # [nchips*2H]
    # dedup: keep first occurrence only (sorted)
    all_cand = jnp.sort(all_cand)
    dup = jnp.concatenate([jnp.zeros(1, bool), all_cand[1:] == all_cand[:-1]])
    all_cand = jnp.where(dup, I64_MAX, all_cand)

    counts = (
        _count_keys_in(r_keys_sorted, r_n, all_cand)
        + _count_keys_in(s_keys_sorted, s_n, all_cand)
    )
    counts = jax.lax.psum(counts, axis)
    heavy = (counts > threshold) & (all_cand != I64_MAX)
    # re-sort: masking non-heavy entries to I64_MAX breaks monotonicity,
    # and is_key_in binary-searches this set
    heavy_keys = jnp.sort(jnp.where(heavy, all_cand, I64_MAX))
    return heavy_keys, heavy


def is_key_in(keys: jnp.ndarray, heavy_keys_sorted: jnp.ndarray) -> jnp.ndarray:
    """Membership mask via binary search (heavy set is sorted, I64_MAX-padded)."""
    idx = jnp.searchsorted(heavy_keys_sorted, keys, side="left")
    idx = jnp.minimum(idx, heavy_keys_sorted.shape[0] - 1)
    return heavy_keys_sorted[idx] == keys


def replicate_rows(table: Table, mask: jnp.ndarray, axis: str, per_shard_capacity: int):
    """All-gather the masked rows of every shard -> replicated Table of
    capacity nchips*per_shard_capacity on each chip. Returns
    (replicated table, overflow count)."""
    picked = compact(table, mask)
    overflow = jnp.maximum(picked.num_rows - per_shard_capacity, 0)
    picked = picked.with_capacity(per_shard_capacity)  # pad or trim to the wire size
    cols = {}
    for name, col in picked.columns.items():
        cols[name] = jax.lax.all_gather(col, axis, tiled=True)
    counts = jax.lax.all_gather(
        jnp.minimum(picked.num_rows, per_shard_capacity)[None], axis, tiled=True)
    nshards = counts.shape[0]
    slot = jnp.arange(nshards * per_shard_capacity, dtype=jnp.int32)
    valid = (slot % per_shard_capacity) < counts[slot // per_shard_capacity]
    return compact(Table(cols, nshards * per_shard_capacity), valid), overflow
