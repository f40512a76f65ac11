#!/usr/bin/env python
"""A/B PVTv2-B5 forward variants at 352^2 (bs=8): scan unroll factors.

Unrolling the per-stage block scan lets XLA fuse across block boundaries
(e.g. the next block's LayerNorm into the previous FFN epilogue) at the
cost of program size.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.pvt_v2 import PVT_V2_VARIANTS, PVTv2

BS = int(os.environ.get("BS", "8"))
SIZE = 352


from tools._timing import timed as _timed


def timed(fn, args, n=10):
    return _timed(fn, args, n)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    base = dataclasses.replace(PVT_V2_VARIANTS["pvt_v2_b5"], remat=False)

    unrolls = [int(u) for u in
               os.environ.get("UNROLLS", "1,2,5").split(",")]
    for unroll in unrolls:
        cfg = dataclasses.replace(base, scan_unroll=unroll)
        model = PVTv2(config=cfg, dtype=jnp.bfloat16)
        v = jax.jit(lambda m=model: m.init(jax.random.PRNGKey(0), img))()

        @jax.jit
        def run(v, x, m=model):
            outs = m.apply(v, x, train=False)
            return sum(jnp.mean(o.astype(jnp.float32)) for o in outs)

        t = timed(run, (v, x))
        print(f"unroll={unroll:2d}   {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
