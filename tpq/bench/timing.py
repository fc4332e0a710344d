"""Slope-based device timing — the only trustworthy wall-clock on this
box (B1 support; SURVEY.md §2.4, §6).

Measured 2026-08-18 on the axon-tunneled v5e (scripts/tpu_timing_probe.py,
scripts/tpu_memo_probe.py):

  * `jax.block_until_ready` does NOT reliably wait for remote completion —
    a 1 GiB streaming op "completed" in 38 us (would be 56 TB/s) and an
    8192^3 bf16 matmul in 41 us (26,800 TFLOP/s, 68x the chip's 394 peak).
    Only a data-dependent readback is a true completion barrier.
  * Every synced call carries a ~53 ms constant tunnel/dispatch overhead
    with +-2-5 ms noise, so single-call timing measures the tunnel, not
    the device.
  * Independent identical dispatches, chained (data-dependent) dispatches,
    and cycled distinct buffers all cost the same per-iteration device
    time — no result memoization; dispatching k independent calls and
    syncing once is a valid way to amortize the constant.

Method: measure elapsed(k0) and elapsed(k1) for dispatch counts k0 < k1
(min over reps), growing k1 until the delta clears a noise floor; the
difference quotient is the per-execution device time, immune to constant
overhead. Sanity-checked against hardware specs: stream 600-640 GB/s
(v5e HBM spec ~819), matmul 183 TFLOP/s (peak 394).
"""

from __future__ import annotations

import time

import jax
import numpy as np


def force_sync(out) -> None:
    """True completion barrier: block_until_ready plus a data-dependent
    scalar readback (the readback cannot be served before the producing
    program finishes; block_until_ready alone returns early on axon)."""
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    # same expression every call => jit-cache hit, no compile pollution
    np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def _timed_burst(fn, args, k: int, reps: int) -> float:
    """Best-of-reps wall seconds for k back-to-back dispatches + one sync."""
    best = float("inf")
    for _ in range(reps):
        force_sync(fn(*args))  # drain the queue
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        force_sync(o)
        best = min(best, time.perf_counter() - t0)
    return best


def slope_time(fn, args, counts=None, reps: int = 3,
               noise_floor: float = 0.040,
               max_seconds: float = 120.0) -> tuple[float, list]:
    """Per-execution seconds of jitted `fn(*args)`.

    Measures bursts of k0=1 and k1=8 dispatches; doubles k1 until
    elapsed(k1) - elapsed(k0) exceeds `noise_floor` (40 ms >> the
    +-2-5 ms sync jitter) or the time budget runs out. Returns
    (sec_per_exec, [(k, best_s), ...]).

    `counts` (legacy) seeds (k0, k1) from its min/max when given."""
    out = fn(*args)
    force_sync(out)  # compile + warm the readback executable
    t_start = time.perf_counter()

    k0, k1 = 1, 8
    if counts:
        k0, k1 = min(counts), max(max(counts), k0 + 1)

    t0 = _timed_burst(fn, args, k0, reps)
    pts = [(k0, t0)]
    while True:
        r = max(1, reps - 1) if t0 * k1 > 2.0 else reps
        t1 = _timed_burst(fn, args, k1, r)
        pts.append((k1, t1))
        if t1 - t0 >= noise_floor or k1 >= 512:
            break
        if time.perf_counter() - t_start > max_seconds:
            break
        k1 *= 2

    slope = (pts[-1][1] - pts[0][1]) / (pts[-1][0] - pts[0][0])
    if slope <= 0:  # degenerate (noise exceeded signal at budget cap)
        slope = min(t / k for k, t in pts)
    return float(slope), pts
