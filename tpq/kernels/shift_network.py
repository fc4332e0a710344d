"""Monotone flat shift networks — the in-tile data mover every grouped-RH
kernel is built from (SURVEY.md §2.1 C3/C4 realization; design round 2).

Problem: Mosaic/TPU has no per-element scatter and its only gather is
`take_along_axis` within a 128-lane row. But the two data-dependent moves a
partitioned join needs — PAD (place sorted rows at strictly-increasing
destinations, inserting gaps) and PACK (compact valid rows, deleting gaps)
— are *order-preserving*, and an order-preserving move decomposes into
log2(n) collision-free stages of power-of-two shifts:

  * expansion (right shifts, dest_i = src_i + s_i, s_i >= 0 non-decreasing):
    process bits MSB->LSB; after the k-stage every element sits at
    src_i + (s_i >> k << k), which is strictly increasing => no collisions.
  * compaction (left shifts, s_i non-decreasing): process bits LSB->MSB
    (mirror argument).

Both verified collision-free by exhaustive host-side simulation (300 random
mask patterns each; the opposite bit orders collide in 100% of trials).

A "flat" shift by c on an (R,128) tile moves element (r,l) to the position
c places later in row-major order: lane roll + a conditional sublane roll
for the wrapped lanes — all static-shift `pltpu.roll`s, verified compiling
and fast on v5e (scripts/tpu_r2_pallas_forms.py roll cases, ~830 GB/s/roll).

Everything here is a plain jnp function usable inside Pallas kernel bodies
(and, unchanged, in interpret mode / on CPU for tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def _roll(v: jnp.ndarray, sh: int, axis: int, mosaic: bool) -> jnp.ndarray:
    """Static-shift roll toward higher indices. `mosaic=True` uses the
    native pltpu.roll (compiled TPU kernels only — it has no interpret/eval
    rule); False uses jnp.roll (CPU, interpret mode, plain XLA)."""
    if sh == 0:
        return v
    if mosaic:
        return pltpu.roll(v, sh, axis)
    return jnp.roll(v, sh, axis)


def flat_roll_right(v: jnp.ndarray, c: int, mosaic: bool = False) -> jnp.ndarray:
    """Roll an (R,128) tile by +c positions in row-major (flat) order.
    Wraps at the tile end (callers mask; movers never wrap by construction)."""
    rows = v.shape[0]
    lanes = v.shape[1]
    rowshift, laneshift = divmod(c, lanes)
    rowshift %= rows
    if laneshift == 0:
        return _roll(v, rowshift, 0, mosaic)
    r = _roll(v, laneshift, 1, mosaic)
    r0 = _roll(r, rowshift, 0, mosaic)
    r1 = _roll(r, (rowshift + 1) % rows, 0, mosaic)
    lane = jax.lax.broadcasted_iota(I32, v.shape, 1)
    return jnp.where(lane < laneshift, r1, r0)


def flat_roll_left(v: jnp.ndarray, c: int, mosaic: bool = False) -> jnp.ndarray:
    """Roll an (R,128) tile by -c positions in flat order."""
    rows, lanes = v.shape
    return flat_roll_right(v, (rows * lanes - c) % (rows * lanes), mosaic)


def route(planes: list[jnp.ndarray], occ: jnp.ndarray, shift: jnp.ndarray,
          direction: str, mosaic: bool = False) -> tuple[list[jnp.ndarray], jnp.ndarray]:
    """Move every occupied element of the (R,128) tile by its own `shift`
    (non-negative, flat positions), rightward ("expand") or leftward
    ("pack"). Requires the monotone order-preserving contract (module
    docstring): shifts non-decreasing in flat order over occupied elements
    and distinct destinations. All planes, `occ` (0/1) and `shift` are i32
    — bool vectors are avoided on purpose (Mosaic i1 support is spotty).
    Returns (moved planes, moved occupancy); vacated slots hold zeros.
    """
    if direction not in ("expand", "pack"):
        raise ValueError(direction)
    rows, lanes = occ.shape
    n = rows * lanes
    nbits = max(1, (n - 1).bit_length())
    ks = range(nbits - 1, -1, -1) if direction == "expand" else range(nbits)
    roll_fn = flat_roll_right if direction == "expand" else flat_roll_left

    def roll(v, c):
        return roll_fn(v, c, mosaic)

    # Zero unoccupied slots: the movement step is `p*keep + roll(p*move)`,
    # which adds the arrival into whatever the slot held — correct only if
    # vacant slots hold 0.
    vals = [p * occ for p in planes]
    for k in ks:
        move = occ * ((shift >> k) & 1)   # 0/1 plane
        keep = 1 - move
        vals = [p * keep + roll(p * move, 1 << k) for p in vals]
        shift = shift * keep + roll(shift * move, 1 << k)
        occ = occ * keep + roll(move, 1 << k)
    return vals, occ


# ---------------------------------------------------------------------------
# host/test twin
# ---------------------------------------------------------------------------

def route_reference(planes, occ, shift, direction):
    """Numpy oracle for route(): explicit destination scatter."""
    import numpy as np

    occ = np.asarray(occ)
    shift = np.asarray(shift)
    rows, lanes = occ.shape
    n = rows * lanes
    flat_occ = occ.reshape(-1)
    flat_shift = shift.reshape(-1)
    out_planes = [np.zeros(n, np.asarray(p).dtype) for p in planes]
    out_occ = np.zeros(n, bool)
    sign = 1 if direction == "expand" else -1
    for i in range(n):
        if not flat_occ[i]:
            continue
        d = i + sign * int(flat_shift[i])
        assert 0 <= d < n, f"dest {d} out of tile"
        assert not out_occ[d], f"collision at {d}"
        out_occ[d] = True
        for o, p in zip(out_planes, planes):
            o[d] = np.asarray(p).reshape(-1)[i]
    return ([o.reshape(rows, lanes) for o in out_planes],
            out_occ.reshape(rows, lanes))
