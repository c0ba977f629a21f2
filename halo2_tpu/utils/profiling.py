"""Lightweight tracing/profiling for the prover hot path.

The reference wires criterion + pprof flamegraphs into its benches
(halo2_gadgets/benches/primitives.rs:13-67); the TPU-native analog is:

- ``phase(name)``: wall-clock phase timers that accumulate into a global
  report when ``HALO2_TPU_PROFILE=1`` (zero overhead otherwise).  The prover
  brackets each protocol phase (commit-advice, lookups, permutation,
  quotient, multiopen) so a slow phase is visible without a profiler.
- ``device_trace(logdir)``: context manager around ``jax.profiler.trace`` —
  captures an XLA/TensorBoard trace (the TPU "flamegraph": per-kernel HLO
  timings, HBM traffic) for any enclosed region.

Usage::

    HALO2_TPU_PROFILE=1 python bench_full.py 14   # prints the phase report

    with device_trace("/tmp/jax-trace"):
        create_proof(...)
    # then: tensorboard --logdir /tmp/jax-trace
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

_times: Dict[str, List[float]] = defaultdict(list)


def enabled() -> bool:
    return os.environ.get("HALO2_TPU_PROFILE") == "1"


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Accumulate wall time under ``name`` when profiling is enabled."""
    if not enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _times[name].append(time.perf_counter() - t0)


def profiled(name: str):
    """Decorator form of :func:`phase`."""

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with phase(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def report(reset: bool = True) -> List[Tuple[str, int, float]]:
    """[(phase, calls, total_seconds)] sorted by total descending."""
    out = sorted(
        ((k, len(v), sum(v)) for k, v in _times.items()),
        key=lambda t: -t[2],
    )
    if reset:
        _times.clear()
    return out


def print_report() -> None:
    rows = report()
    if not rows:
        return
    total = sum(t for _, _, t in rows)
    print(f"-- halo2_tpu profile ({total:.2f}s total) --")
    for name, calls, secs in rows:
        print(f"{secs:8.2f}s  {calls:4d}x  {name}")


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """XLA device trace (TensorBoard format) around the enclosed block."""
    import jax

    with jax.profiler.trace(logdir):
        yield
