"""Hierarchical wall-clock timers (reference Tools::StartTiming /
StopTiming / PrintTiming, src/HYMLS_Tools.cpp:345-438,549), with
block-until-ready semantics for device work."""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


_REGISTRY = []


class Timer:
    """Label-keyed accumulating timers with call counts."""

    def __init__(self, name: str = ""):
        self.name = name
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        _REGISTRY.append(self)

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


def print_timing() -> str:
    """Aggregated end-of-run timing table over every Timer created in
    the process (the role of the reference's Tools::PrintTiming,
    src/HYMLS_Tools.cpp:549, called at driver exit src/main.cpp:515):
    one row per '<timer>: <label>', sorted by total time."""
    rows = {}
    for t in _REGISTRY:
        for label, total in t._totals.items():
            key = f"{t.name}: {label}" if t.name else label
            tot, cnt = rows.get(key, (0.0, 0))
            rows[key] = (tot + total, cnt + t._counts[label])
    width = max([len(k) for k in rows] + [20])
    lines = ["=" * (width + 30),
             f"{'timer':{width}s} {'total':>10s} {'calls':>6s} {'avg':>10s}",
             "-" * (width + 30)]
    for key, (tot, cnt) in sorted(rows.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"{key:{width}s} {tot:9.4f}s {cnt:6d} "
                     f"{tot / max(cnt, 1):9.4f}s")
    lines.append("=" * (width + 30))
    return "\n".join(lines)


def reset_timing():
    """Clear the global timer registry (fresh aggregation window)."""
    _REGISTRY.clear()


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
