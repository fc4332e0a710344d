"""D3 — exchange/compute overlap via double-buffered macro-chunks
(SURVEY.md §2.2 D3; BASELINE.json:L5 "exchange overlapped with
build/probe compute via double-buffered pipelines").

The probe side is split into `n_chunks` static macro-chunks. Each chunk's
shuffle exchange depends only on its own slice, and each local join only
on its own exchanged chunk — the dependence graph is

    ex(0) -> join(0)      ex(1) -> join(1)      ...

with no cross-chunk edges, so XLA's async collective scheduler is free to
run ex(i+1) while join(i) computes (the loop is unrolled: chunks are a
static config knob, SURVEY.md §7.3.3 static-shapes rule). On a real slice
this is what keeps the probe fed when shuffle is ICI-bound
(BASELINE.md D3); on one chip it degenerates harmlessly.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpq.columnar import Table


def chunk_table(t: Table, n_chunks: int) -> list[Table]:
    """Static split along the capacity axis; chunk c holds rows
    [c*cap/n, (c+1)*cap/n) with a clamped local row count."""
    cap = t.capacity
    assert cap % n_chunks == 0, (cap, n_chunks)
    ck = cap // n_chunks
    out = []
    for c in range(n_chunks):
        cols = {k: v[c * ck:(c + 1) * ck] for k, v in t.columns.items()}
        n = jnp.clip(t.num_rows - c * ck, 0, ck)
        out.append(Table(cols, n))
    return out


def concat_tables(tables: list[Table]) -> tuple[Table, jnp.ndarray]:
    """Concatenate chunked results (each with leading-valid rows) into one
    capacity-summed Table + the slot-validity mask (caller compacts)."""
    names = tables[0].names
    cols = {n: jnp.concatenate([t.columns[n] for t in tables]) for n in names}
    valid = jnp.concatenate([t.valid_mask() for t in tables])
    total = jnp.sum(jnp.stack([t.num_rows for t in tables]))
    return Table(cols, total), valid
