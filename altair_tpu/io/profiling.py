"""Profiling/tracing instrumentation (SURVEY.md §5.1).

The reference wraps every phase in manual ``TStopwatch`` timers and writes
them into CSV footers (``fluxAtObserverOptimize.C:524-531,657-670``).  The
sweep drivers here keep that footer contract; this module adds the
device-level layer the reference never had: ``jax.profiler`` traces viewable
in TensorBoard/Perfetto, plus a lightweight phase-timer with the same
wall/CPU reporting style.
"""

from __future__ import annotations

import contextlib
import os
import time


class PhaseTimer:
    """Named phase timing with the reference's report style."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> str:
        lines = [f"{k}: {v:.6g} seconds" for k, v in self.phases.items()]
        total = sum(self.phases.values())
        lines.append(f"Total execution time: {total:.6g} seconds")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/altair_tpu_trace",
                 host_tracer_level: int = 2):
    """Capture a ``jax.profiler`` trace of the enclosed block.

    View with TensorBoard (`tensorboard --logdir <log_dir>`) or upload the
    .trace.json.gz to Perfetto.  No-ops gracefully if profiling is
    unsupported on the backend.
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"profiler unavailable: {e}")
        started = False
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """``jax.profiler.TraceAnnotation`` pass-through for labelling custom
    phases inside a device trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
