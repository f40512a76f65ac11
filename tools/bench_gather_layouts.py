#!/usr/bin/env python
"""What bounds the warp gather on TPU: row count, bytes, or tile padding?

Times jnp.take of Q rows from a [Q, L] table for several lane widths L and
dtypes at the flow-loss shape (Q = 8*352*352). If time is ~constant across
L, each gathered row costs a fixed (8,128)-tile fetch and lane packing is
free; if time scales with L, bytes matter.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

Q = 8 * 352 * 352


from tools._timing import timed as _timed


def timed(fn, args, n=10):
    return _timed(fn, args, n)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, Q, size=Q), jnp.int32)

    for lanes in (8, 16, 32, 128):
        for dtype in (jnp.float32, jnp.bfloat16):
            tbl = jnp.asarray(
                rng.standard_normal((Q, lanes)), dtype
            )

            @jax.jit
            def take(tbl, idx):
                return jnp.take(tbl, idx, axis=0).astype(jnp.float32).mean()

            t = timed(take, (tbl, idx))
            print(f"take [{Q},{lanes:3d}] {jnp.dtype(dtype).name:9s}"
                  f" {t*1e3:7.2f} ms")

    # half the rows (is it linear in Q?)
    tbl = jnp.asarray(rng.standard_normal((Q, 16)), jnp.float32)
    idx_h = idx[: Q // 2]

    @jax.jit
    def take_h(tbl, idx_h):
        return jnp.take(tbl, idx_h, axis=0).astype(jnp.float32).mean()

    t = timed(take_h, (tbl, idx_h))
    print(f"take [{Q//2},16] float32   {t*1e3:7.2f} ms (half rows)")

    # sorted (spatially coherent) indices: does locality help?
    idx_s = jnp.sort(idx)

    @jax.jit
    def take_s(tbl, idx_s):
        return jnp.take(tbl, idx_s, axis=0).astype(jnp.float32).mean()

    t = timed(take_s, (tbl, idx_s))
    print(f"take [{Q},16] f32 sorted   {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
