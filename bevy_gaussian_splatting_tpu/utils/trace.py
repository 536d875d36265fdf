"""Tracing / frame diagnostics.

The reference's observability layer is bevy's FrameTimeDiagnosticsPlugin (FPS
with EMA smoothing, viewer/viewer.rs:763-794) plus debug spans.  TPU
equivalents:

  - :class:`FrameDiagnostics` — EMA-smoothed frame time / FPS counter for the
    serving loops (headless --benchmark, viewer/serve.py HUD)
  - :func:`trace` — context manager around ``jax.profiler.trace`` producing a
    TensorBoard-loadable device trace (per-op/per-kernel timing on TPU)
  - :class:`StageTimer` — coarse host-side span timing with named sections
    (relay-safe: only measures enqueue-to-readback walls the caller chooses)
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class FrameDiagnostics:
    """Exponential-moving-average frame clock (reference default smoothing
    factor ~2/(N+1) with N=20 history)."""

    def __init__(self, smoothing: int = 20):
        self.alpha = 2.0 / (smoothing + 1)
        self.ema_ms: Optional[float] = None
        self.last: Optional[float] = None
        self.frames = 0

    def tick(self) -> Optional[float]:
        """Mark a frame boundary; returns smoothed ms/frame (None on first)."""
        now = time.perf_counter()
        if self.last is not None:
            dt_ms = (now - self.last) * 1e3
            self.ema_ms = (
                dt_ms if self.ema_ms is None
                else self.ema_ms + self.alpha * (dt_ms - self.ema_ms)
            )
        self.last = now
        self.frames += 1
        return self.ema_ms

    @property
    def fps(self) -> Optional[float]:
        return None if not self.ema_ms else 1e3 / self.ema_ms


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (view in TensorBoard / Perfetto)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Named host-side spans: ``with timer.span('binning'): ...``; totals in
    ``timer.totals_ms``."""

    def __init__(self):
        self.totals_ms: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            self.totals_ms[name] = self.totals_ms.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        return "  ".join(
            f"{k}={v / max(self.counts[k], 1):.2f}ms" for k, v in self.totals_ms.items()
        )
