"""Segment expansion — the static-shape replacement for the reference's
data-dependent "emit one output row per match" loops (SURVEY.md §3.2,
§7.3.3).

Given per-source-row match segments (offset into the output, count), build
gather indices for an output of static capacity:

  out slot t belongs to source row seg(t), with within-segment rank
  rank(t) = t - offset[seg(t)].

Implemented with one scatter + one cummax (no data-dependent control flow):
scatter j into slot offset[j] for every j with count>0 (empty segments are
dropped via out-of-bounds index + mode='drop'), then a running max fills
each segment with its source row id.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exclusive_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.cumsum(x) - x


def expand_segments(counts: jnp.ndarray, capacity: int):
    """counts: int32[n] — matches per source row (0 for invalid rows).

    Returns (seg_id, rank, total, valid):
      seg_id: int32[capacity] — source row for each output slot (clamped >=0)
      rank:   int32[capacity] — within-segment position
      total:  int32 scalar — true number of output rows (may exceed capacity
              => overflow; caller must check)
      valid:  bool[capacity] — slot < total
    """
    n = counts.shape[0]
    counts = counts.astype(jnp.int32)
    offsets = exclusive_cumsum(counts)
    total = offsets[-1] + counts[-1]
    src = jnp.arange(n, dtype=jnp.int32)
    # only segments with count>0 scatter their start; clamp offset into range
    # but divert empty segments out of bounds so they drop.
    scatter_to = jnp.where(counts > 0, offsets, capacity)
    mark = jnp.full(capacity, -1, jnp.int32).at[scatter_to].max(src, mode="drop")
    seg_id = jax.lax.cummax(mark)
    seg_id = jnp.maximum(seg_id, 0)
    rank = jnp.arange(capacity, dtype=jnp.int32) - offsets[seg_id]
    valid = jnp.arange(capacity, dtype=jnp.int32) < total
    return seg_id, rank, total, valid
