"""Profiling and throughput observability.

The reference's only observability is wall-clock per epoch split
(reference: runner.py:11,19-21). TPU-native additions:
- ``trace``: context manager around jax.profiler (XPlane traces viewable in
  TensorBoard/Perfetto)
- ``Throughput``: edges/sec / windows/sec counters (the BASELINE primary
  metric) with EMA smoothing
- ``step_timer``: robust step timing on async backends (blocks on a scalar
  readback — see project memory on axon timing pitfalls)
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """EMA throughput counters keyed by unit (e.g. 'edges', 'windows')."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.rates: Dict[str, float] = {}
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def step(self, **units: int) -> Dict[str, float]:
        """Record one step's work (e.g. step(edges=500000, windows=512))."""
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return dict(self.rates)
        dt = max(now - self._last, 1e-9)
        self._last = now
        for unit, count in units.items():
            rate = count / dt
            if unit in self.rates:
                self.rates[unit] = (
                    (1 - self.alpha) * self.rates[unit] + self.alpha * rate
                )
            else:
                self.rates[unit] = rate
        return dict(self.rates)

    def summary(self) -> str:
        return " ".join(f"{u}/s={r:,.0f}" for u, r in self.rates.items())


def block_on(x) -> None:
    """Force real completion of a device computation (a scalar readback;
    ``block_until_ready`` alone is not reliable on remote-execution
    backends)."""
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))
