"""First-class profiling hooks.

The reference has no built-in tracing (SURVEY.md §5: a checked-in cProfile
dump and ad-hoc timing prints). Here profiling is a context manager around
jax.profiler plus lightweight named stage timers that land in the same
scalars.jsonl stream as training metrics.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(out_dir: str):
    """Capture a jax.profiler trace (viewable in XProf/TensorBoard or
    Perfetto) for the enclosed block."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock stage timing, optionally tee'd to a MetricsWriter.

    >>> timer = StageTimer(writer)
    >>> with timer.stage("counting"):
    ...     run_counting(...)
    >>> timer.report()
    """

    def __init__(self, writer=None):
        self.writer = writer
        self.stages: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages.append((name, dt))
            if self.writer is not None:
                self.writer.scalar(f"stage_seconds/{name}", dt, step=len(self.stages))

    def report(self) -> str:
        lines = [f"{name}: {dt:.3f}s" for name, dt in self.stages]
        out = "\n".join(lines)
        print(out)
        return out
