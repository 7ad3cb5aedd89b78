"""Tracing / profiling (first-class aux subsystem).

The reference has no tracing on the MMPFN path (SURVEY.md §5: tqdm + a dead
`device_utilization` field). Here profiling is a module: phase timers that
force device completion, a `jax.profiler` trace context for Perfetto/XProf dumps,
and compiled-FLOPs introspection via cost analysis.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any

import jax

logger = logging.getLogger(__name__)


@dataclass
class PhaseTimer:
    """Accumulating wall-clock timers keyed by phase name.

    Under async dispatch (and the axon relay, where `block_until_ready` is
    unreliable — see tests/conftest notes), `sync=True` forces a tiny device
    readback so timings bound actual completion.
    """

    sync: bool = True
    totals: dict[str, float] = field(default_factory=lambda: defaultdict(float))
    counts: dict[str, int] = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    jax.device_put(0.0).block_until_ready()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict[str, Any]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(self.totals[name] / max(self.counts[name], 1) * 1e3, 2),
            }
            for name in sorted(self.totals)
        }

    def log(self, level: int = logging.INFO) -> None:
        logger.log(level, "phase timings: %s", json.dumps(self.report()))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mmpfn_trace"):
    """Capture a device trace viewable in Perfetto/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *args, **kwargs) -> dict[str, float]:
    """FLOPs / bytes-accessed of the compiled program (XLA cost analysis)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return {
            "flops": float(analysis.get("flops", -1)),
            "bytes_accessed": float(analysis.get("bytes accessed", -1)),
        }
    except Exception as e:  # cost analysis unsupported on some backends
        return {"error": repr(e)}


def live_device_memory() -> dict[str, int]:
    """Per-device live HBM bytes (observability for the memory estimator)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
            out[str(d)] = int(stats.get("bytes_in_use", -1))
        except Exception:
            out[str(d)] = -1
    return out
