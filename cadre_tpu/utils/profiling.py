"""Tracing/profiling — a first-class subsystem the reference lacks
(SURVEY §5.1: its line_profiler/torchsnooper imports are all commented out).

- `trace(...)`: context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto.
- `PhaseTimer`: wall-clock accounting of named phases (env-step vs
  device-step vs update) with rate reporting.
- `PerformanceCounter`: episode count + running mean reward
  (ppo_agent/utils.py PerformanceCounter contract).
- `ThroughputMeter`: EMA frames/sec and env-steps/sec counters.
"""
from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace scope; no-op when disabled."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name]
                / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


class PerformanceCounter:
    """Episode count + running mean reward (ppo_agent/utils.py:70-106)."""

    def __init__(self):
        self.count = 0
        self.mean_reward = 0.0

    def update(self, reward: float) -> None:
        self.count += 1
        self.mean_reward += (reward - self.mean_reward) / self.count

    def reset(self) -> None:
        self.count = 0
        self.mean_reward = 0.0


class ThroughputMeter:
    def __init__(self, alpha: float = 0.1):
        self._alpha = alpha
        self._rate: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, n: int = 1) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            if dt > 0:
                inst = n / dt
                self._rate = inst if self._rate is None else (
                    self._alpha * inst + (1 - self._alpha) * self._rate)
        self._last = now

    @property
    def rate(self) -> float:
        return self._rate or 0.0
