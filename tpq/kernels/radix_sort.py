"""C5 — radix sort for the merge path (SURVEY.md §2.1 C5;
BASELINE.json:L5 "radix sort for the merge path"; oracle twin:
oracle/radix_sort.h).

Implementation choice is measurement-driven (SURVEY.md §7.3.4): XLA's
TPU `lax.sort` sustains ~0.3 ms for a 2M-row multi-operand stable sort
(scripts/tpu_prims.py) — within the single-pass HBM budget a hand-rolled
LSD radix pipeline could at best approach. `sort_rows` therefore lowers
to one stable multi-operand `lax.sort`; `radix_sort_perm` exposes the
permutation form used by tests against the C++ oracle (oracle
radix-sorts with an explicit LSD loop — independent algorithm, same
contract).

A Pallas MSD building block stays available for ordered partitioning:
`msd_partition` splits on the top bits via C3 (histogram + stable
reorder) producing contiguous key ranges — the piece the distributed
merge path uses to bound per-chunk sort sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpq.columnar import Table
from tpq.kernels.radix_partition import partition_padded

I32 = jnp.int32
I64_MIN = jnp.iinfo(jnp.int64).min


def radix_sort_perm(keys: jnp.ndarray, num_valid=None) -> jnp.ndarray:
    """Permutation that stably sorts `keys` ascending (int64 order);
    rows >= num_valid order last."""
    if num_valid is not None:
        keys = jnp.where(jnp.arange(keys.shape[0]) < num_valid, keys,
                         jnp.iinfo(keys.dtype).max)
    idx = jnp.arange(keys.shape[0], dtype=I32)
    _, perm = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
    return perm


def sort_rows(t: Table, key: str = "key") -> Table:
    """Co-sort every column of t by `key` (padding last) in ONE
    multi-operand sort — no separate gather passes."""
    k = jnp.where(t.valid_mask(), t.col(key), jnp.iinfo(t.col(key).dtype).max)
    names = [n for n in t.names if n != key]
    sorted_ops = jax.lax.sort((k, *(t.columns[n] for n in names)),
                              num_keys=1, is_stable=True)
    cols = {key: sorted_ops[0]}
    cols.update(dict(zip(names, sorted_ops[1:])))
    return Table(cols, t.num_rows)


def msd_partition(keys: jnp.ndarray, num_valid, bits: int, part_cap: int):
    """Partition rows by the TOP `bits` of the (sign-biased) key: output
    partitions are contiguous, ordered key ranges — recursing or locally
    sorting each yields a full sort (MSD radix). Returns
    (rowid2d [2^bits, part_cap], valid2d, overflow)."""
    biased = (keys.astype(jnp.uint64) ^ jnp.uint64(1 << 63))
    npart = 1 << bits
    bucket = (biased >> jnp.uint64(64 - bits)).astype(I32)
    bucket = jnp.where(jnp.arange(keys.shape[0]) < num_valid, bucket, npart)
    rowid2d, valid2d, _, overflow = partition_padded(bucket, npart, part_cap)
    return rowid2d, valid2d, overflow
