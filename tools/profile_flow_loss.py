#!/usr/bin/env python
"""Micro-attribution of unsup_flow_loss pieces on the real chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.losses.flow import UnsupFlowLossConfig, ssim_distance, unsup_flow_loss
from emip_tpu.ops.warp import flow_warp_loss, occlusion_mask_backward

BS = int(os.environ.get("BS", "8"))
SIZE = 352


from tools._timing import timed as _timed


def timed(fn, args, n=8):
    return _timed(fn, args, n)


def main():
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    im2 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 2)) * 5,
                       jnp.float32)

    t = timed(jax.jit(lambda f: occlusion_mask_backward(f)), (flow,))
    print(f"occlusion_mask_backward  {t*1e3:8.1f} ms")

    t = timed(jax.jit(lambda x, f: flow_warp_loss(x, f)), (im2, flow))
    print(f"flow_warp_loss           {t*1e3:8.1f} ms")

    t = timed(jax.jit(lambda a, b: ssim_distance(a, b)), (im1, im2))
    print(f"ssim_distance            {t*1e3:8.1f} ms")

    cfg = UnsupFlowLossConfig()
    t = timed(
        jax.jit(lambda f1, f2, a, b: unsup_flow_loss([(f1, f2)], a, b, cfg)),
        (flow, flow, im1, im2),
    )
    print(f"unsup_flow_loss          {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
