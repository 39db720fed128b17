"""Hierarchical wall-clock timers (reference Tools::StartTiming /
StopTiming / PrintTiming, src/HYMLS_Tools.cpp:345-438,549), with
block-until-ready semantics for device work."""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class Timer:
    """Label-keyed accumulating timers with call counts."""

    def __init__(self, name: str = ""):
        self.name = name
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def scope(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            try:
                import jax
                jax.effects_barrier()
            except Exception:
                pass
            dt = time.perf_counter() - t0
            self._totals[label] += dt
            self._counts[label] += 1

    def total(self, label: str) -> float:
        return self._totals.get(label, 0.0)

    def count(self, label: str) -> int:
        return self._counts.get(label, 0)

    def report(self) -> str:
        lines = [f"Timer report [{self.name}]"]
        for label in sorted(self._totals, key=self._totals.get,
                            reverse=True):
            lines.append(f"  {label:40s} {self._totals[label]:10.4f}s "
                         f"({self._counts[label]} calls)")
        return "\n".join(lines)

    def print_report(self):
        print(self.report())


def device_memory_report() -> str:
    """Per-device live-buffer memory (the role of the reference's
    LD-interposed malloc ledger, src/HYMLS_Malloc.cpp +
    Tools::PrintMemUsage)."""
    import jax
    lines = []
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            used = stats.get("bytes_in_use", 0)
            peak = stats.get("peak_bytes_in_use", 0)
            lines.append(f"  {d}: in use {used/1e6:.1f} MB, "
                         f"peak {peak/1e6:.1f} MB")
        except Exception:
            lines.append(f"  {d}: no memory stats")
    return "Device memory:\n" + "\n".join(lines)
