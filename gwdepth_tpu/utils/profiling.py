"""Profiling / tracing helpers.

The reference has no tracer — only wall-clock meters + CUDA peak memory in
MetricLogger (reference: src/util/misc.py:199-239, SURVEY.md §5). The TPU
build exposes jax.profiler: TensorBoard-readable device traces plus a
step-timing context manager."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf.

    with trace("exp/run0/trace"):
        state, logs = train_step(state, batch, rng)
        jax.block_until_ready(logs)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight step timing with compile/steady-state split."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        steady = self.times[2:] or self.times
        return {
            "first_step_s": self.times[0],
            "steady_mean_s": sum(steady) / len(steady),
            "steps_per_sec": len(steady) / max(sum(steady), 1e-9),
        }


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Per-device memory stats where the backend reports them (the CUDA
    max-memory printout analogue, misc.py:232-239)."""
    try:
        d = jax.devices()[0]
        return d.memory_stats()
    except Exception:
        return None
