"""B4 — profiler trace capture (SURVEY.md §2.4 B4, §5.1).

`jax.profiler` wrapping for bench runs: `with trace_if(dir):` captures an
xprof trace; `annotate(name)` wraps host-side dispatch of one operator
phase so partition/build/probe/exchange separate in the trace. Applied
around jit dispatch only — never inside traced code.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace_if(trace_dir: str | None):
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)
