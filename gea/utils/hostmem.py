"""Host-memory guard for long training runs (round 5).

The tunneled TPU client retains a host-side staging copy of every
``device_put`` payload for the life of the process (reproduced in
isolation by ``benchmarks/leak_probe.py``: ~1:1 payload leak per put on
the axon backend, flat on CPU; neither ``jax.Array.delete()`` nor
``gc.collect`` releases it). A streaming trainer therefore grows host
RSS by the input-batch size every dispatch — the 256x256 run
(~25 MB/step) was killed by the kernel OOM killer at 130 GB after
~3,600 steps, losing everything after its last checkpoint.

The leak lives below the PJRT API, so the framework-side defense is a
guard, not a fix: watch VmRSS; when it crosses the budget, write a clean
checkpoint and exit with a distinct code (19) so a supervisor (or the
trainer's own auto-resume on relaunch) continues from the exact step.
The companion mitigation that removes the per-step transfer entirely is
the device-resident dataset cache (``--device_data_cache``).
"""

from __future__ import annotations

EXIT_HOST_RSS = 19  # distinct from argparse (2), watchdog (17), crash (1)


def host_rss_gb() -> float:
    """Current process resident set, in GB (decimal)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) * 1e-6
    except OSError:
        pass
    return 0.0


def total_ram_gb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return int(line.split()[1]) * 1e-6
    except OSError:
        pass
    return 0.0


def resolve_rss_budget_gb(flag_value: float) -> float:
    """Map the --max_host_rss_gb flag to a concrete budget.

    0 (default) = auto: 85% of system RAM — comfortably past any honest
    working set, comfortably before the kernel OOM killer. Negative
    disables the guard. Positive values are taken literally.
    """
    if flag_value < 0:
        return float("inf")
    if flag_value == 0:
        total = total_ram_gb()
        return 0.85 * total if total else float("inf")
    return flag_value
