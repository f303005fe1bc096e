"""Profiling & tracing utilities (a new capability — the reference has none
beyond tqdm progress bars, SURVEY §5).

- `trace(logdir)`: jax.profiler trace context (open in TensorBoard/XProf or
  Perfetto);
- `PhaseTimer`: wall-clock per-phase accounting with device sync, for the
  pipeline stages (CMP flow, adapter warp, denoise loop, VAE decode);
- `annotate`: named TraceAnnotation for kernel-level attribution.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulates per-phase wall-clock with block_until_ready fencing."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name:30s} {self.totals[name]:9.3f}s "
                         f"x{self.counts[name]}")
        return "\n".join(lines)
