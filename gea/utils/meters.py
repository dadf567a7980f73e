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

    def tick(self, n: int = 1) -> None:
        """Record n completed train steps (n > 1 for chunked dispatch)."""
        prev = self._count
        self._count += n
        if prev < self.warmup_steps <= self._count:
            self._t0 = time.perf_counter()
        elif prev >= self.warmup_steps:
            self._steps_timed += n

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
