"""D5 — end-to-end distributed hash join (SURVEY.md §2.2 D5, §3.3;
BASELINE.json:L11 config 5).

partition-by-owner -> shuffle exchange (D2) -> local join (C6), the whole
body one shard_map over the mesh. Results stay row-sharded (left on the
owning chip); tests gather and canonicalize.

DistTable is the sharded twin of Table: columns are globally-shaped
arrays sharded P('x') on the row axis, plus a per-shard row-count vector
(also P('x')) standing in for the scalar num_rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpq.columnar import Table, next_pow2
from tpq.dist.exchange import exchange
from tpq.dist.mesh import AXIS, owner_of
from tpq.ops import hash_join, merge_join


@dataclass
class DistTable:
    """Row-sharded table: each of nchips shards owns local_capacity rows."""

    columns: dict[str, jax.Array]  # global shape [nchips * local_capacity]
    shard_rows: jax.Array  # int32[nchips] — live rows per shard

    @property
    def nshards(self) -> int:
        return self.shard_rows.shape[0]

    @property
    def local_capacity(self) -> int:
        return next(iter(self.columns.values())).shape[0] // self.nshards

    @classmethod
    def from_numpy(cls, cols: dict[str, np.ndarray], mesh: Mesh,
                   local_capacity: int | None = None) -> "DistTable":
        nchips = mesh.devices.size
        n = len(next(iter(cols.values())))
        per = (n + nchips - 1) // nchips
        local_cap = local_capacity or next_pow2(per)
        sharding = NamedSharding(mesh, P(AXIS))
        out, counts = {}, []
        for i in range(nchips):
            counts.append(max(0, min(per, n - i * per)))
        for name, c in cols.items():
            buf = np.zeros(nchips * local_cap, dtype=c.dtype)
            for i in range(nchips):
                buf[i * local_cap:i * local_cap + counts[i]] = c[i * per:i * per + counts[i]]
            out[name] = jax.device_put(buf, sharding)
        shard_rows = jax.device_put(np.asarray(counts, np.int32), sharding)
        return cls(out, shard_rows)

    def to_numpy(self) -> dict[str, np.ndarray]:
        """Gather + concatenate live rows of every shard (test/debug path)."""
        counts = np.asarray(self.shard_rows)
        local_cap = self.local_capacity
        out = {}
        for name, c in self.columns.items():
            c = np.asarray(c)
            out[name] = np.concatenate(
                [c[i * local_cap:i * local_cap + counts[i]] for i in range(len(counts))])
        return out


def dist_hash_join(
    r: DistTable,
    s: DistTable,
    mesh: Mesh,
    out_capacity_per_shard: int,
    exchange_capacity: int | None = None,
    algo: str = "hash",
    exchange_impl: str = "dense",
    key: str = "key",
) -> tuple[DistTable, jax.Array]:
    """Distributed inner equi-join. Returns (row-sharded result,
    overflow counts int32[nchips] — nonzero means a shard's exchange
    bucket or join output overflowed and capacities must be renegotiated
    (SURVEY.md §5.3))."""
    nchips = mesh.devices.size
    # worst case one chip owns everything; default halves that with slack 2x
    ex_cap = exchange_capacity or max(128, next_pow2(2 * r.local_capacity // max(1, nchips) * 2))

    r_spec = {n: P(AXIS) for n in r.columns}
    s_spec = {n: P(AXIS) for n in s.columns}
    out_names = [key] + [f"r_{n}" for n in r.columns if n != key] \
        + [f"s_{n}" for n in s.columns if n != key]
    out_spec = {n: P(AXIS) for n in out_names}

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(r_spec, P(AXIS), s_spec, P(AXIS)),
        out_specs=(out_spec, P(AXIS), P(AXIS)),
    )
    def body(r_cols, r_n, s_cols, s_n):
        R = Table(r_cols, r_n[0])
        S = Table(s_cols, s_n[0])
        R2, r_ovf = exchange(R, owner_of(R.col(key), nchips), AXIS, nchips,
                             ex_cap, impl=exchange_impl)
        S2, s_ovf = exchange(S, owner_of(S.col(key), nchips), AXIS, nchips,
                             ex_cap, impl=exchange_impl)
        if algo == "hash":
            out = hash_join(R2, S2, out_capacity_per_shard, key=key)
        else:
            out = merge_join(R2, S2, out_capacity_per_shard, key=key)
        out_overflow = (out.num_rows > out_capacity_per_shard).astype(jnp.int32)
        ovf = (r_ovf + s_ovf + out_overflow)[None]
        n_out = jnp.minimum(out.num_rows, out_capacity_per_shard)[None]
        return dict(out.columns), n_out.astype(jnp.int32), ovf

    out_cols, out_counts, overflow = body(r.columns, r.shard_rows, s.columns, s.shard_rows)
    return DistTable(out_cols, out_counts), overflow
