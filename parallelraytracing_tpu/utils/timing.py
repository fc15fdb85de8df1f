"""Per-stage frame timing.

The headless analogue of the reference's live ImGui timing graphs
(main.cpp:265-462: render / film-update / upload ms + FPS with 100-frame
rolling histories).  Keeps the same 100-entry ring buffers; `summary()`
prints what the graphs displayed."""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict

HISTORY = 100  # main.cpp:177 historySize


class FrameTimer:
    def __init__(self) -> None:
        self._hist: Dict[str, collections.deque] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._hist.setdefault(name, collections.deque(maxlen=HISTORY)) \
                .append(dt)

    def last(self, name: str) -> float:
        h = self._hist.get(name)
        return h[-1] if h else 0.0

    def mean(self, name: str) -> float:
        h = self._hist.get(name)
        return sum(h) / len(h) if h else 0.0

    def history(self, name: str):
        return list(self._hist.get(name, ()))

    def summary(self) -> str:
        lines = ["stage             last ms    mean ms   (n)"]
        for name, h in self._hist.items():
            lines.append(f"{name:<16} {h[-1]*1e3:9.2f} {sum(h)/len(h)*1e3:10.2f}"
                         f"  ({len(h)})")
        return "\n".join(lines)
