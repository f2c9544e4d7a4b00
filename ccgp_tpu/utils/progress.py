"""Progress reporting and stage timing.

The reference wraps its slow loops in a text progress bar (`apply_pb`,
`1D Codes and Designs/1D Combined GP Public.R:36-53`, and `Metro`'s bar).
Device-side loops here are single compiled programs, so per-iteration bars
don't apply; instead this module provides (a) a host-side progress wrapper
for multi-study sweeps and (b) stage timers + optional JAX profiler traces
for the perf workflow (SURVEY section 5's tracing upgrade).
"""
from __future__ import annotations

import contextlib
import sys
import time
from typing import Iterable, Iterator, Optional


def progress(it: Iterable, total: Optional[int] = None, width: int = 40,
             label: str = "", stream=sys.stderr) -> Iterator:
    """Minimal dependency-free progress bar over a host-side iterable."""
    items = list(it) if total is None else it
    n = total if total is not None else len(items)
    start = time.time()
    for i, v in enumerate(items):
        yield v
        done = i + 1
        frac = done / max(n, 1)
        bar = "=" * int(frac * width)
        el = time.time() - start
        stream.write(f"\r{label}[{bar:<{width}}] {done}/{n} {el:6.1f}s")
        stream.flush()
    stream.write("\n")


@contextlib.contextmanager
def stage_timer(name: str, sink: Optional[dict] = None, stream=sys.stderr):
    """Wall-clock a pipeline stage; record into `sink` if given."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    else:
        stream.write(f"[{name}] {dt * 1e3:.1f} ms\n")


@contextlib.contextmanager
def jax_trace(logdir: str):
    """JAX profiler trace around a block (view with TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
