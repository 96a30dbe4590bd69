"""Profiling helpers: tunnel-safe timing, roofline counters, jax traces.

The reference's only instrumentation is GPU-memory prints and residual lines
(SURVEY.md section 5).  Here:
* :func:`timed` — wall-times a jitted callable with forced host readback
  (``block_until_ready`` does not synchronize on tunneled backends) and a
  two-point slope option that cancels constant dispatch latency.
* :class:`Roofline` — nnz/s, elements/s, GB/s counters for kernels.
* :func:`trace` — context manager around jax.profiler (no-op if unsupported).
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import numpy as np


def _sync_scalar(x) -> float:
    import jax.numpy as jnp
    return float(jnp.sum(jnp.asarray(x)) if hasattr(x, "shape") else x)


def timed(fn: Callable, *args, reps: int = 3) -> float:
    """Median wall time of fn(*args); result is reduced + read to host."""
    _sync_scalar(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync_scalar(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed_slope(make_fn: Callable[[int], Callable], lo: int, hi: int,
                *args, reps: int = 3) -> float:
    """Per-iteration time via two loop lengths (cancels constant latency).

    make_fn(iters) must return a jitted callable running `iters` iterations.
    """
    t1 = timed(make_fn(lo), *args, reps=reps)
    t2 = timed(make_fn(hi), *args, reps=reps)
    return max((t2 - t1) / (hi - lo), 1e-12)


@dataclasses.dataclass
class Roofline:
    """Throughput bookkeeping for a kernel measurement."""

    seconds: float
    flops: float = 0.0
    bytes_moved: float = 0.0
    items: float = 0.0

    @property
    def gflops(self) -> float:
        return self.flops / self.seconds / 1e9

    @property
    def gbps(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def items_per_s(self) -> float:
        return self.items / self.seconds

    def report(self, name: str = "kernel") -> str:
        return (f"{name}: {self.seconds*1e3:.3f} ms | "
                f"{self.gflops:.1f} GFLOP/s | {self.gbps:.1f} GB/s | "
                f"{self.items_per_s:.3g} items/s")


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpufem_trace"):
    """jax profiler trace (viewable with xprof/tensorboard); no-op on
    backends that cannot trace."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
