"""Tracing/profiling helpers (SURVEY.md §5.1 — absent in the reference).

Thin wrappers over ``jax.profiler`` plus a throughput meter for the
frames/sec numbers this framework is benchmarked on. Traces are viewable
in Perfetto/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["annotate", "capture_trace", "ThroughputMeter"]


def annotate(label: str):
    """Named trace region (shows up in the profiler timeline)::

        with annotate("train_step"):
            model, opt_state, loss = step(model, opt_state, batch)
    """
    return jax.profiler.TraceAnnotation(label)


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a full device trace into ``log_dir``::

        with capture_trace("/tmp/trace"):
            run_steps()
        # then: tensorboard --logdir /tmp/trace  (or open in Perfetto)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Running frames/sec counter.

    ``update(n_frames)`` after each synced step; ``rate`` is the
    exponentially-smoothed frames/sec, ``mean_rate`` the lifetime mean.
    """

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self.rate = 0.0
        self._total_frames = 0
        self._t_start = None
        self._t_last = None

    def update(self, n_frames: int):
        now = time.perf_counter()
        if self._t_start is None:
            self._t_start = self._t_last = now
            return
        dt = now - self._t_last
        self._t_last = now
        self._total_frames += n_frames
        if dt > 0:
            inst = n_frames / dt
            self.rate = (
                inst
                if self.rate == 0.0
                else self.smoothing * self.rate + (1 - self.smoothing) * inst
            )

    @property
    def mean_rate(self) -> float:
        if self._t_start is None or self._t_last == self._t_start:
            return 0.0
        return self._total_frames / (self._t_last - self._t_start)
