"""D2 — distributed shuffle exchange (SURVEY.md §2.2 D2).

The communication backend: on TPU the NCCL/MPI all-to-all of a CPU/GPU
engine is replaced by XLA collectives over ICI (intra-slice) / DCN
(cross-slice), reached through `shard_map` — BASELINE.json:L5
"distributed shuffle exchange (ragged all-to-all over ICI)".

Fallback ladder (SURVEY.md §5.8), all semantically identical:
  1. `ragged_all_to_all` — exact row counts on the wire;
  2. dense `all_to_all` with per-destination padding (this module's
     default: always available, static shapes everywhere);
  3. `ppermute` ring — the overlap-friendly variant (D3).

All functions here run INSIDE a shard_map body: arrays are the local
shard, `axis` is the mesh axis name.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpq.columnar import Table
from tpq.ops._expand import exclusive_cumsum
from tpq.ops.filter import compact


def bucket_by_dest(table: Table, dest: jnp.ndarray, nbuckets: int, bucket_capacity: int):
    """Scatter local rows into a [nbuckets * bucket_capacity] send layout,
    rows of bucket d contiguous at d*bucket_capacity. Returns
    (bucketed_cols, counts[nbuckets], overflow_count).

    Stable within bucket (sort-by-dest reorder, SURVEY.md §7.3.4: sort-based
    reorder keeps the exchange deterministic).
    """
    cap = table.capacity
    dest = jnp.where(table.valid_mask(), dest, nbuckets)  # pads to sentinel
    dest = jax.lax.optimization_barrier(dest)  # keep producers out of the sort
    order = jnp.argsort(dest, stable=True)
    dest_sorted = dest[order]
    ones = (dest_sorted < nbuckets).astype(jnp.int32)
    counts_ext = jax.ops.segment_sum(ones, dest_sorted, num_segments=nbuckets + 1)
    counts = counts_ext[:nbuckets].astype(jnp.int32)
    offsets = exclusive_cumsum(counts_ext.astype(jnp.int32))
    pos_in_bucket = jnp.arange(cap, dtype=jnp.int32) - offsets[jnp.minimum(dest_sorted, nbuckets)]
    in_range = (dest_sorted < nbuckets) & (pos_in_bucket < bucket_capacity)
    overflow = jnp.sum((dest_sorted < nbuckets) & ~in_range, dtype=jnp.int32)
    flat_idx = jnp.where(in_range, dest_sorted * bucket_capacity + pos_in_bucket,
                         nbuckets * bucket_capacity)
    out_cols = {}
    for name, col in table.columns.items():
        out_cols[name] = (
            jnp.zeros(nbuckets * bucket_capacity, col.dtype)
            .at[flat_idx].set(col[order], mode="drop")
        )
    counts = jnp.minimum(counts, bucket_capacity)
    return out_cols, counts, overflow


def exchange_dense(table: Table, dest: jnp.ndarray, axis: str, nchips: int,
                   bucket_capacity: int):
    """Dense all_to_all exchange. Returns (local Table of received rows with
    capacity nchips*bucket_capacity, send_overflow scalar)."""
    bucketed, counts, overflow = bucket_by_dest(table, dest, nchips, bucket_capacity)
    recv_counts = jax.lax.all_to_all(counts, axis, split_axis=0, concat_axis=0, tiled=True)
    recv_cols = {}
    for name, col in bucketed.items():
        col2 = col.reshape(nchips, bucket_capacity)
        recv = jax.lax.all_to_all(col2, axis, split_axis=0, concat_axis=0)
        recv_cols[name] = recv.reshape(nchips * bucket_capacity)
    slot = jnp.arange(nchips * bucket_capacity, dtype=jnp.int32)
    valid = (slot % bucket_capacity) < recv_counts[slot // bucket_capacity]
    received = Table(recv_cols, nchips * bucket_capacity)
    return compact(received, valid), overflow


def exchange_ragged(table: Table, dest: jnp.ndarray, axis: str, nchips: int,
                    bucket_capacity: int):
    """`jax.lax.ragged_all_to_all` exchange — only real row bytes cross ICI.

    Offsets bookkeeping: each sender needs its write offset in every
    receiver's buffer; that is the exclusive scan over senders of the
    transposed size matrix, obtained with one dense all_to_all of the
    counts vector (SURVEY.md §2.2 D2).
    """
    bucketed, counts, overflow = bucket_by_dest(table, dest, nchips, bucket_capacity)
    input_offsets = (jnp.arange(nchips, dtype=jnp.int32) * bucket_capacity)
    send_sizes = counts
    # sizes each peer will send me:
    recv_sizes = jax.lax.all_to_all(counts, axis, split_axis=0, concat_axis=0, tiled=True)
    # my write offsets on each receiver = exclusive-scan over senders there:
    my_offsets_there = jax.lax.all_to_all(exclusive_cumsum(recv_sizes), axis,
                                          split_axis=0, concat_axis=0, tiled=True)
    out_cap = nchips * bucket_capacity
    recv_cols = {}
    for name, col in bucketed.items():
        out_buf = jnp.zeros(out_cap, col.dtype)
        recv_cols[name] = jax.lax.ragged_all_to_all(
            col, out_buf, input_offsets, send_sizes,
            my_offsets_there, recv_sizes, axis_name=axis)
    total = jnp.sum(recv_sizes).astype(jnp.int32)
    return Table(recv_cols, total), overflow


def exchange(table: Table, dest: jnp.ndarray, axis: str, nchips: int,
             bucket_capacity: int, impl: str = "dense"):
    if impl == "dense":
        return exchange_dense(table, dest, axis, nchips, bucket_capacity)
    if impl == "ragged":
        return exchange_ragged(table, dest, axis, nchips, bucket_capacity)
    raise ValueError(f"unknown exchange impl {impl!r}")
