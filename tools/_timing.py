"""Shared chain-differential timer for the benchmark/profile tools.

The remote TPU runtime acks before execution completes, so wall-clocking a
single call under-measures. ``timed`` times k dependent-ish calls, fetches
one scalar at the end (forcing execution), and differences two chain
lengths to cancel the fixed host/RTT overhead (see bench.py docstring).
"""

from __future__ import annotations

import time

import jax


def timed(fn, args, n: int = 8) -> float:
    """Marginal per-call seconds of ``fn(*args)`` on the default device."""

    def chain(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    chain(1)  # compile / warm
    t1 = chain(2)
    tn = chain(2 + n)
    return (tn - t1) / n
