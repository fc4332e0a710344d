"""C3 — radix partition: histogram + stable reorder into padded
per-partition planes (SURVEY.md §2.1 C3; BASELINE.json:L5
"radix-partitioned build tables").

Two pieces:

  * `radix_histogram` — Pallas kernel: per-tile bucket histogram via
    one-hot matmul (the MXU turns counting into a [tile, nbuckets]
    one-hot contraction; SURVEY.md §7.4.2 lists this as the candidate
    design), accumulated across grid steps in a VMEM-resident output
    block. Used for partition planning, exchange sizing, and skew stats
    without materializing any reorder.

  * `partition_padded` — stable reorder of rows into a [npart, part_cap]
    padded layout. Realization is the measured-fast path on TPU: one
    stable multi-operand `lax.sort` by bucket + searchsorted starts +
    2-D gather (scripts/tpu_prims.py: 2M-row stable sort = 0.3 ms while
    a general scatter serializes; SURVEY.md §7.3.4 sort-based-twin rule).
    This is the building block under the robin-hood join (C4) and the
    shuffle exchange bucketing (D2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def _hist_kernel(nbuckets: int, bucket_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    b = bucket_ref[:]  # [1, tile]
    onehot = (b[0, :, None] == jax.lax.broadcasted_iota(I32, (b.shape[1], nbuckets), 1))
    counts = jnp.sum(onehot.astype(jnp.float32), axis=0, keepdims=True)
    out_ref[:] += counts.astype(I32)


def radix_histogram(bucket: jnp.ndarray, nbuckets: int, tile: int = 8192,
                    interpret: bool = False) -> jnp.ndarray:
    """Counts of each bucket id in [0, nbuckets); ids outside the range
    (e.g. the padding sentinel) are ignored. bucket: int32[N], N % tile == 0."""
    n = bucket.shape[0]
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, nbuckets),
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nbuckets), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nbuckets), I32),
        interpret=interpret,
    )(bucket.reshape(1, n))
    return out[0]


def partition_starts(bucket_sorted: jnp.ndarray, npart: int) -> jnp.ndarray:
    """Exclusive prefix layout of a bucket-sorted column: starts[p] = first
    row of partition p; starts[npart] = end of live rows."""
    return jnp.searchsorted(bucket_sorted, jnp.arange(npart + 1, dtype=I32)).astype(I32)


def padded_gather(col: jnp.ndarray, starts: jnp.ndarray, npart: int, cap: int):
    """[N]-sorted column -> [npart, cap] padded planes + validity mask."""
    i = jnp.arange(cap, dtype=I32)[None, :]
    src = jnp.minimum(starts[:-1][:, None] + i, col.shape[0] - 1)
    valid = i < (starts[1:] - starts[:-1])[:, None]
    return col[src], valid


def partition_padded(bucket: jnp.ndarray, npart: int, part_cap: int,
                     extra_keys: tuple[jnp.ndarray, ...] = ()):
    """Stable-partition row indices by bucket id (sentinel id == npart is
    padding and lands at the end). Returns (rowid2d [npart, part_cap],
    valid2d, starts, overflow_flag). `extra_keys` refine the order within
    a bucket (e.g. (slot, key) for the robin-hood layout)."""
    n = bucket.shape[0]
    idx = jnp.arange(n, dtype=I32)
    operands = jax.lax.optimization_barrier((bucket, *extra_keys)) + (idx,)
    sorted_ops = jax.lax.sort(operands, num_keys=1 + len(extra_keys), is_stable=True)
    bucket_s, idx_s = sorted_ops[0], sorted_ops[-1]
    starts = partition_starts(bucket_s, npart)
    part_len = starts[1:] - starts[:-1]
    overflow = jnp.any(part_len > part_cap)
    rowid2d, valid2d = padded_gather(idx_s, starts, npart, part_cap)
    return rowid2d, valid2d, starts, overflow
