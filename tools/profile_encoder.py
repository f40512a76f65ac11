#!/usr/bin/env python
"""GMFlow CNN encoder cost attribution at 352^2 (bs=8).

Times the full encoder, a no-InstanceNorm build (IN stubbed to identity;
upper-bounds what a fused IN kernel could save), and a stem-only build
(the 7x7/s2 3->64 conv, which XLA lowers poorly for 3 input channels).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import emip_tpu.models.gmflow.encoder as enc

BS = int(os.environ.get("BS", "8"))
SIZE = 352


from tools._timing import timed as _timed


def timed(fn, args, n=10):
    return _timed(fn, args, n)


def bench(label, model, x):
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1]))()

    @jax.jit
    def run(v, x):
        return jnp.mean(model.apply(v, x)[0].astype(jnp.float32))

    print(f"{label:28s} {timed(run, (v, x)) * 1e3:7.2f} ms")


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)

    model = enc.CNNEncoder(dtype=jnp.bfloat16)
    bench("encoder full", model, x)

    real_in = enc.instance_norm
    enc.instance_norm = lambda y, epsilon=1e-5: y
    try:
        bench("encoder no-IN", model, x)
    finally:
        enc.instance_norm = real_in

    import flax.linen as nn

    class StemOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                        dtype=jnp.bfloat16, name="conv1")(x)
            return [nn.relu(enc.instance_norm(y))]

    bench("stem only (7x7/s2 + IN)", StemOnly(), x)


if __name__ == "__main__":
    main()
