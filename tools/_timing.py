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
    """Marginal per-call seconds of ``fn(*args)`` on the default device.

    Calls are made truly data-dependent (each call's first array argument is
    perturbed by a zero derived from the previous output) so the remote
    runtime cannot overlap them — independent-call chains measurably
    mis-attribute costs over the tunnel (CLAUDE.md round-2 findings).
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(list(args))
    dep_i = next(
        (i for i, l in enumerate(leaves)
         if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)),
        None,
    )

    def chain(k):
        t0 = time.perf_counter()
        cur = list(leaves)
        o = None
        for _ in range(k):
            o = fn(*jax.tree_util.tree_unflatten(treedef, cur))
            if dep_i is not None:
                s = jax.tree_util.tree_leaves(o)[0].ravel()[0]
                zero = (s * 0).astype(leaves[dep_i].dtype)
                cur = list(leaves)
                cur[dep_i] = leaves[dep_i] + zero
        _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    chain(1)  # compile / warm
    t1 = chain(2)
    tn = chain(2 + n)
    return (tn - t1) / n
