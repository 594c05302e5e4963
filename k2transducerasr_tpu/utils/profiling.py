"""Profiling/observability helpers (the reference has none — SURVEY.md §5).

``trace(dir)``: context manager around ``jax.profiler`` producing a
TensorBoard-loadable trace of device execution.
``Stopwatch``: cheap wall-clock section timing with an audio-seconds meter.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulates wall time + processed audio seconds; reports RTF and
    audio-s/s (the framework's first-class throughput meter)."""

    def __init__(self):
        self.wall = 0.0
        self.audio = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.time()
        return self

    def stop(self, audio_seconds: float = 0.0):
        if self._t0 is not None:
            self.wall += time.time() - self._t0
            self._t0 = None
        self.audio += audio_seconds

    @property
    def rtf(self) -> float:
        return self.wall / max(self.audio, 1e-9)

    @property
    def audio_s_per_s(self) -> float:
        return self.audio / max(self.wall, 1e-9)

    def report(self) -> str:
        return (
            f"elapsed_milliseconds:{self.wall * 1000:.4f}\n"
            f"total_duration:{self.audio * 1000:.0f}\n"
            f"rtf:{self.rtf}"
        )
