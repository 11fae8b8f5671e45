"""Profiling utilities.

Reference: ad-hoc memory_profiler/tracemalloc/psutil instrumentation
(main.py:15,173-179,441-449). TPU-native: jax.profiler traces (viewable in
TensorBoard/Perfetto) plus a trace-parsing summary so hot ops can be ranked
without a UI, and host RSS reporting.
"""
from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import time
from collections import Counter
from typing import Dict, List, Optional, Tuple


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace around a code block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(logdir: str, top: int = 20,
                    divide_by: int = 1) -> List[Tuple[str, float, str]]:
    """Rank XLA ops by total device time from the newest trace in logdir.

    Returns [(op name, ms, hlo snippet)]; prints a table.
    """
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    tids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg: Counter = Counter()
    meta: Dict[str, str] = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e \
                and tids.get((e["pid"], e.get("tid"))) == "XLA Ops":
            agg[e["name"]] += e["dur"]
            meta.setdefault(e["name"],
                            (e.get("args", {}).get("long_name") or "")[:100])
    rows = [(n, d / 1000 / divide_by, meta[n]) for n, d in agg.most_common(top)]
    total = sum(agg.values()) / 1000 / divide_by
    print(f"total device time: {total:.1f} ms")
    for n, ms, hlo in rows:
        print(f"{ms:9.2f} ms  {n[:28]:30s} {hlo}")
    return rows


def host_memory_mb() -> float:
    """Resident host memory (reference psutil printers, main.py:173-179)."""
    try:
        import psutil

        return psutil.Process().memory_info().rss / 1e6
    except ImportError:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1000.0
    return 0.0


class StepTimer:
    """Wall-clock per-step timing with running mean
    (reference main.py:269,337 time.time() deltas)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.total = 0.0
        self.count = 0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        self.total += dt
        self.count += 1
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)
