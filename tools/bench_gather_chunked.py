#!/usr/bin/env python
"""Is a big TPU gather superlinear in output rows? Chunked-take A/B.

bench_gather_layouts measured take of Q rows at 6.48 ms but Q/2 rows at
1.81 ms from the same [Q, 16] fp32 table. If that scaling holds, issuing
the warp gather as several smaller takes should win.
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
    tbl = jnp.asarray(rng.standard_normal((Q, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, Q, size=Q), jnp.int32)

    for chunks in (1, 2, 4, 8, 16):

        @jax.jit
        def take(tbl, idx, chunks=chunks):
            qs = Q // chunks
            outs = [
                jnp.take(tbl, idx[i * qs : (i + 1) * qs], axis=0)
                for i in range(chunks)
            ]
            return sum(o.mean() for o in outs)

        t = timed(take, (tbl, idx))
        print(f"chunks={chunks:2d}  {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
