"""C9 — filter: predicate -> mask -> compaction (SURVEY.md §2.1 C9).

Reference capability: filter (BASELINE.json:L5,L10); oracle twin:
oracle/main.cc filter(). TPU realization: vectorized predicate, exclusive
cumsum of the keep-mask for destination slots, one scatter — static
capacity preserved, new num_rows as a device scalar (never a host sync).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from tpq.columnar import Table

_OPS: dict[str, Callable] = {
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
}


def compact(t: Table, keep: jnp.ndarray) -> Table:
    """Keep rows where `keep` (bool[capacity]); stable order."""
    keep = keep & t.valid_mask()
    n_out = jnp.sum(keep, dtype=jnp.int32)
    dest = (jnp.cumsum(keep.astype(jnp.int32)) - 1).astype(jnp.int32)
    scatter_to = jnp.where(keep, dest, t.capacity)  # dropped when not kept
    cols = {
        name: jnp.zeros_like(col).at[scatter_to].set(col, mode="drop")
        for name, col in t.columns.items()
    }
    return Table(cols, n_out)


def filter_table(t: Table, col: str, op: str, value) -> Table:
    """Rows of t where `col <op> value`; op in lt/le/gt/ge/eq/ne."""
    c = t.col(col)
    keep = _OPS[op](c, jnp.asarray(value, c.dtype))
    return compact(t, keep)
