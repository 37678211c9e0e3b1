"""Metric meters + training logger.

Functional equivalent of the reference's `SmoothedValue`/`MetricLogger`
(reference: src/util/misc.py:26-245): windowed median/avg meters, a global
average, periodic console lines with ETA + iteration/data timing, and a
cross-process sync point. Under single-controller JAX the "distributed
sync" is a no-op for the common case (all hosts see identical jit outputs);
with multiprocess runtimes `sync()` reduces (count, total) pairs with
`jax.experimental.multihost_utils` when available — the `all_reduce`
analogue of misc.py:44-55.
"""

from __future__ import annotations

import collections
import datetime
import time
from typing import Callable, Dict, Iterable, Iterator, Optional

import numpy as np


class SmoothedValue:
    """Track a series over a sliding window + global stats
    (reference: src/util/misc.py:26-86)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        # torch.median semantics: LOWER of the two middle values for even
        # counts (reference misc.py:57-59), not numpy's midpoint average
        if not self.deque:
            return 0.0
        d = sorted(self.deque)
        return float(d[(len(d) - 1) // 2])

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def sync(self):
        """Reduce (count, total) across hosts (misc.py:44-55 analogue)."""
        try:
            import jax
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                arr = multihost_utils.process_allgather(
                    np.array([self.count, self.total]))
                self.count = int(arr[:, 0].sum())
                self.total = float(arr[:, 1].sum())
        except Exception:
            pass

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """(reference: src/util/misc.py:158-245)."""

    def __init__(self, delimiter: str = "  ", print_freq: int = 10,
                 is_main: bool = True):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(
            SmoothedValue)
        self.delimiter = delimiter
        self.print_freq = print_freq
        self.is_main = is_main

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.sync()

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, header: str = "",
                  total: Optional[int] = None,
                  before_print: Optional[Callable[[], None]] = None
                  ) -> Iterator:
        """Yield items, printing a status line with ETA + iter/data time
        every `print_freq` (misc.py:199-245). `before_print` runs just
        ahead of each status line (and once at the end) — used to flush
        batched device->host metric transfers so the printed meters are
        current without per-step pulls."""
        total = total if total is not None else (
            len(iterable) if hasattr(iterable, "__len__") else None)
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        start = time.time()
        end = time.time()
        i = 0
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if self.is_main and (i % self.print_freq == 0 or
                                 (total and i == total - 1)):
                if before_print is not None:
                    before_print()
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    prefix = f"{header} [{i}/{total}] eta: {eta_str}"
                else:
                    prefix = f"{header} [{i}]"
                print(self.delimiter.join([
                    prefix, str(self),
                    f"time: {iter_time}", f"data: {data_time}"]), flush=True)
            i += 1
            end = time.time()
        if self.is_main:
            tt = str(datetime.timedelta(seconds=int(time.time() - start)))
            n = max(i, 1)
            print(f"{header} Total time: {tt} "
                  f"({(time.time() - start) / n:.4f} s / it)", flush=True)


def git_sha_banner() -> str:
    """'sha: <sha>, status: <clean|has uncommitted changes>, branch: <b>' —
    the reference prints this at startup (reference: src/util/misc.py:248-265,
    main_glassrgbd.py:26). Returns 'N/A' parts outside a git checkout."""
    import os
    import subprocess

    cwd = os.path.dirname(os.path.abspath(__file__))

    def run(cmd):
        try:
            return subprocess.check_output(
                cmd, cwd=cwd, stderr=subprocess.DEVNULL).decode().strip()
        except Exception:
            return "N/A"

    sha = run(["git", "rev-parse", "HEAD"])
    diff = run(["git", "diff-index", "HEAD"])
    branch = run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    status = "has uncommitted changes" if diff and diff != "N/A" else "clean"
    return f"sha: {sha}, status: {status}, branch: {branch}"
