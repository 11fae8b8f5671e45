"""Honest timing on the axon-tunneled TPU.

Two backend quirks make naive timing wrong here (measured):
  1. `block_until_ready()` does not reliably block — sub-ms "timings" of
     multi-ms programs.
  2. A scalar readback costs ~30 ms of relay round-trip latency.
So: enqueue `iters` back-to-back calls (the device executes the queue in
order), force completion with one small readback at the end, and amortize
the fixed readback/dispatch overhead over the iterations.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def _force(out) -> float:
    """Materialize a cheap scalar view of one leaf (host readback).
    Slices on-device first so only one element crosses the tunnel."""
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    return float(x.reshape(-1)[0])


def time_fn(f: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-free throughput timing: total wall clock of `iters` enqueued
    calls divided by iters (ms per call). Includes dispatch, excludes compile.
    """
    for _ in range(warmup):
        out = f(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _force(out)
    dt = time.perf_counter() - t0
    return dt * 1e3 / iters
