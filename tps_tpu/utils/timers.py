"""Hierarchical wall-clock timers (the GRVY timer analog).

Mirrors the role of the reference's grvy_timer_begin/end + summarize
(reference: src/M2ulPhyS.cpp:290,1623,2146-2178; src/logger.hpp): named
nested sections accumulated across the run, with a teardown summary table.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timers:
    def __init__(self):
        self._acc: dict[str, float] = {}
        self._count: dict[str, int] = {}
        self._stack: list[str] = []
        self._t0 = time.perf_counter()

    @contextmanager
    def section(self, name: str):
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._acc[full] = self._acc.get(full, 0.0) + dt
            self._count[full] = self._count.get(full, 0) + 1
            self._stack.pop()

    def begin(self, name: str):
        self._stack.append(name)
        self._acc.setdefault("/".join(self._stack), 0.0)
        self._count["__open/" + "/".join(self._stack)] = time.perf_counter()

    def end(self, name: str):
        full = "/".join(self._stack)
        t0 = self._count.pop("__open/" + full, None)
        if t0 is not None:
            self._acc[full] = self._acc.get(full, 0.0) + time.perf_counter() - t0
            self._count[full] = self._count.get(full, 0) + 1
        if self._stack and self._stack[-1] == name:
            self._stack.pop()

    def summarize(self, out=print):
        """Timer summary table (grvy_timer_summarize analog)."""
        total = time.perf_counter() - self._t0
        out(f"--- timer summary (total {total:.3f}s) ---")
        for name in sorted(self._acc):
            acc = self._acc[name]
            cnt = self._count.get(name, 0)
            pct = 100.0 * acc / max(total, 1e-30)
            out(f"  {name:<40s} {acc:10.4f}s  {cnt:8d} calls  {pct:5.1f}%")

    def get(self, name: str) -> float:
        return self._acc.get(name, 0.0)
