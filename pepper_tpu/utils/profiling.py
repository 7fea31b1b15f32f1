"""First-class stage metrics: per-stage wall clock + items/s counters in the
reference's `[MM-DD-YYYY hh:mm:ss] INFO:` log format (its only
observability, SetParameters.py:291-318 / predict_distributed_cpu.py:
215-219), plus jax.profiler trace capture for TPU timelines
(SURVEY.md §5.1 upgrade)."""

from __future__ import annotations

import contextlib
import sys
import time
from datetime import datetime


def log_line(message: str) -> None:
    timestamp = datetime.now().strftime("%m-%d-%Y %H:%M:%S")
    sys.stderr.write(f"[{timestamp}] INFO: {message}\n")
    sys.stderr.flush()


class StageTimer:
    """Context manager: logs elapsed Min/Sec and optional items/s.

    >>> with StageTimer("INFERENCE", unit="windows") as timer:
    ...     timer.add(len(batch))
    """

    def __init__(self, stage: str, unit: str = "items", quiet: bool = False):
        self.stage = stage
        self.unit = unit
        self.quiet = quiet
        self.count = 0
        self.elapsed = 0.0

    def add(self, n: int) -> None:
        self.count += n

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        if not self.quiet:
            mins = int(self.elapsed / 60)
            secs = int(self.elapsed) % 60
            message = (f"{self.stage} ELAPSED TIME: {mins} Min {secs} Sec")
            if self.count:
                message += (f" ({self.count} {self.unit}, "
                            f"{self.count / max(1e-9, self.elapsed):.1f} "
                            f"{self.unit}/s)")
            log_line(message)
        return False


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace capture; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
