"""Step timing + device profiling helpers.

The reference brackets iterations with CUDA events but never reads them
(/root/reference/train_single.py:41-42,86,124); here timing is real:
StepTimer keeps EMA step time and Mpix/s, and trace() wraps a block with a
jax.profiler trace for xprof/tensorboard inspection.
"""
from __future__ import annotations

import contextlib
import time


class StepTimer:
    """EMA over wall-clock step durations + pixel throughput."""

    def __init__(self, pixels_per_step: int = 0, ema: float = 0.9):
        self.pixels = pixels_per_step
        self.ema = ema
        self.avg_s = 0.0
        self._t0 = None
        self.n = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg_s = dt if self.n == 0 else \
            self.ema * self.avg_s + (1 - self.ema) * dt
        self.n += 1
        return dt

    @property
    def steps_per_s(self) -> float:
        return 1.0 / self.avg_s if self.avg_s else 0.0

    @property
    def mpix_per_s(self) -> float:
        return self.pixels * self.steps_per_s / 1e6

    def summary(self) -> str:
        s = f"{self.avg_s * 1e3:.1f} ms/it ({self.steps_per_s:.2f} it/s"
        if self.pixels:
            s += f", {self.mpix_per_s:.2f} Mpix/s"
        return s + ")"


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block; view with xprof/tensorboard."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
