"""Throughput / step-time meters (TPU-native addition; the north-star
metric is images/sec/chip so this is first-class, SURVEY.md §5
'Tracing/profiling')."""

from __future__ import annotations

import time
from typing import Dict, Optional


class ThroughputMeter:
    """Tracks steps/sec and images/sec over a sliding window, excluding an
    initial warmup (compile) period."""

    def __init__(self, batch_size: int, warmup_steps: int = 3) -> None:
        self.batch_size = batch_size
        self.warmup_steps = warmup_steps
        self._count = 0
        self._t0: Optional[float] = None
        self._steps_timed = 0

    def tick(self, n: int = 1) -> bool:
        """Record n dispatched train steps (n > 1 for chunked dispatch).

        Returns True exactly once — when the warmup threshold is crossed
        and the timer starts. Dispatch is ASYNC: the caller should then
        drain the device queue (e.g. fetch a metric scalar, which on
        remote runtimes is the only reliable sync) and call
        restart_timer(), otherwise the first compile lands inside the
        timed window and poisons every cumulative average."""
        prev = self._count
        self._count += n
        if prev < self.warmup_steps <= self._count:
            self._t0 = time.perf_counter()
            return True
        if prev >= self.warmup_steps:
            self._steps_timed += n
        return False

    def restart_timer(self) -> None:
        """Re-zero the clock after the caller synced in-flight work."""
        self._t0 = time.perf_counter()

    def stats(self, num_chips: int = 1) -> Dict[str, float]:
        if self._t0 is None or self._steps_timed == 0:
            return {"steps_per_sec": 0.0, "images_per_sec": 0.0,
                    "images_per_sec_per_chip": 0.0}
        dt = time.perf_counter() - self._t0
        sps = self._steps_timed / dt
        ips = sps * self.batch_size
        return {
            "steps_per_sec": sps,
            "images_per_sec": ips,
            "images_per_sec_per_chip": ips / max(1, num_chips),
        }
