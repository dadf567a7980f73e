"""Loss-curve plotting (reference C2: `common/plotting.py`-style
LossPlotter accumulating per-iteration D/G(/R) losses and rendering a PNG
with matplotlib-Agg; SURVEY.md §2)."""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List


class LossPlotter:
    def __init__(self) -> None:
        self.steps: List[int] = []
        self.series: Dict[str, List[float]] = defaultdict(list)

    def add(self, step: int, **values: float) -> None:
        self.steps.append(step)
        for k, v in values.items():
            self.series[k].append(float(v))

    def plot(self, path: str, ylabel: str = "loss") -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig, ax = plt.subplots(figsize=(10, 5))
        for name, values in sorted(self.series.items()):
            ax.plot(self.steps[: len(values)], values, label=name, linewidth=0.9)
        ax.set_xlabel("iteration")
        ax.set_ylabel(ylabel)
        ax.legend(loc="upper right")
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(path, dpi=110)
        plt.close(fig)
