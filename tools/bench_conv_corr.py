#!/usr/bin/env python
"""conv_corr formulations: 3x3 conv with 1936->968->128 channels at 44^2.

The correlation embedding (reference model.py:59-62) is channel-huge and
spatially tiny — a poor conv layout for the MXU tiler. Candidates:
  conv     — plain lax conv (via flax Conv), NHWC
  im2col   — explicit patch extraction + one [B*H*W, 9*Cin] @ [9*Cin, Cout]
  matmul9  — sum of 9 shifted [BHW, Cin] @ [Cin, Cout] matmuls
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 44, 44
C_IN, C_MID, C_OUT = 1936, 968, 128
DT = jnp.bfloat16


from tools._timing import timed as _timed


def timed(fn, args, n=10):
    return _timed(fn, args, n)


def conv_plain(x, w1, w2):
    dn = lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w1, (1, 1), "SAME", dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
    y = jnp.maximum(y, 0).astype(DT)
    dn2 = lax.conv_dimension_numbers(y.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(y, w2, (1, 1), "SAME",
                                    dimension_numbers=dn2,
                                    preferred_element_type=jnp.float32)


def _shift_matmul(x, w):  # w [3,3,ci,co]
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, h, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy:dy + h, dx:dx + wd, :].reshape(-1, ci)
            out = out + jnp.dot(patch, w[dy, dx],
                                preferred_element_type=jnp.float32
                                ).reshape(b, h, wd, co)
    return out


def conv_matmul9(x, w1, w2):
    y = jnp.maximum(_shift_matmul(x, w1), 0).astype(DT)
    return _shift_matmul(y, w2)


def conv_im2col(x, w1, w2):
    def one(x, w):
        b, h, wd, ci = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dy:dy + h, dx:dx + wd, :]
             for dy in range(3) for dx in range(3)], axis=-1)
        return jnp.dot(cols.reshape(-1, 9 * ci), w.reshape(9 * ci, co),
                       preferred_element_type=jnp.float32
                       ).reshape(b, h, wd, co)

    y = jnp.maximum(one(x, w1), 0).astype(DT)
    return one(y, w2)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C_IN)), DT)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C_IN, C_MID)) * 0.01, DT)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C_MID, C_OUT)) * 0.01, DT)

    want = np.asarray(jax.jit(conv_plain)(x, w1, w2))
    for name, fn in [("conv", conv_plain), ("matmul9", conv_matmul9),
                     ("im2col", conv_im2col)]:
        got = np.asarray(jax.jit(fn)(x, w1, w2))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        t = timed(jax.jit(fn), (x, w1, w2))
        print(f"{name:<10} {t*1e3:7.2f} ms   rel_err={err:.2e}")


if __name__ == "__main__":
    main()
