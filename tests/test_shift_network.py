"""Monotone flat shift networks (tpq/kernels/shift_network.py) — the
order-preserving PAD/PACK data mover. Verified against the explicit
numpy destination-scatter oracle, including the collision-freedom
contract the log-shift decomposition relies on."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpq.kernels.shift_network import (
    flat_roll_left,
    flat_roll_right,
    route,
    route_reference,
)

I32 = np.int32


def _mk(rows, lanes, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(1, 1 << 20, size=(rows, lanes)).astype(I32)
    return rng, vals


@pytest.mark.parametrize("c", [0, 1, 7, 128, 129, 300, 128 * 8 - 1])
def test_flat_roll_matches_numpy_flat(c):
    rows, lanes = 8, 128
    _, vals = _mk(rows, lanes, 0)
    got = np.asarray(flat_roll_right(jnp.asarray(vals), c))
    want = np.roll(vals.reshape(-1), c).reshape(rows, lanes)
    np.testing.assert_array_equal(got, want)
    back = np.asarray(flat_roll_left(jnp.asarray(got), c))
    np.testing.assert_array_equal(back, vals)


def _random_monotone_case(rows, lanes, direction, seed):
    """Random occupancy + a random order-preserving move (distinct,
    in-range destinations, same relative order)."""
    rng, vals = _mk(rows, lanes, seed)
    n = rows * lanes
    occ = (rng.random(n) < 0.6).astype(I32)
    src = np.nonzero(occ)[0]
    k = len(src)
    # contract: per-element shifts non-decreasing in flat order (the PAD /
    # PACK movers always satisfy this: shift = running count of gaps)
    steps = rng.integers(0, 3, size=k)
    shift_v = np.cumsum(steps)
    if direction == "expand":
        over = (src[-1] + shift_v[-1]) - (n - 1) if k else 0
        if over > 0:
            shift_v = np.maximum(shift_v - over, 0)
            shift_v = np.maximum.accumulate(shift_v)
    else:
        # pack family: dest_i = max(i + c, src_i) for a random offset c —
        # shifts src_i - dest_i are non-decreasing, dests strictly increasing
        c = int(rng.integers(0, src[0] + 1)) if k else 0
        shift_v = np.maximum(src - np.arange(k) - c, 0)
    shift = np.zeros(n, I32)
    shift[src] = shift_v
    return vals, occ.reshape(rows, lanes), shift.reshape(rows, lanes).astype(I32)


@pytest.mark.parametrize("direction", ["expand", "pack"])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_route_matches_reference(direction, seed):
    rows, lanes = 8, 128
    vals, occ, shift = _random_monotone_case(rows, lanes, direction, seed)
    want_planes, want_occ = route_reference([vals], occ, shift, direction)
    got_planes, got_occ = route(
        [jnp.asarray(vals)], jnp.asarray(occ), jnp.asarray(shift), direction)
    np.testing.assert_array_equal(np.asarray(got_occ) != 0, want_occ)
    # vacated slots are zero in route(); oracle zeros them too
    np.testing.assert_array_equal(np.asarray(got_planes[0]), want_planes[0])


def test_route_pack_compacts_to_front():
    rows, lanes = 8, 128
    n = rows * lanes
    rng, vals = _mk(rows, lanes, 9)
    occ = (rng.random(n) < 0.4).astype(I32)
    # classic compaction: dest = rank among occupied
    rank = np.cumsum(occ) - occ
    shift = np.where(occ, np.arange(n) - rank, 0).astype(I32)
    got_planes, got_occ = route(
        [jnp.asarray(vals)], jnp.asarray(occ.reshape(rows, lanes)),
        jnp.asarray(shift.reshape(rows, lanes)), "pack")
    k = int(occ.sum())
    flat_occ = np.asarray(got_occ).reshape(-1)
    assert flat_occ[:k].all() and not flat_occ[k:].any()
    np.testing.assert_array_equal(
        np.asarray(got_planes[0]).reshape(-1)[:k], vals.reshape(-1)[occ == 1])
