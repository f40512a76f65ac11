#!/usr/bin/env python
"""PVT training-cost attribution: grad time with sub-ops stubbed.

Times jax.grad of the b5 backbone with (a) everything, (b) the MixFFN
dwconv replaced by identity, (c) SR-attention replaced by its q-projection
only, (d) no remat. Full - variant bounds the sub-op's fwd+bwd share.
(Param trees differ across variants — timing diagnostics only.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import emip_tpu.models.pvt_v2 as pvt

BS = int(os.environ.get("BS", "8"))
SIZE = 352


from tools._timing import timed as _timed


def timed(fn, args, n=6):
    return _timed(fn, args, n)


def bench(label, cfg, x, img):
    only = os.environ.get("PROFILE_ONLY")  # comma-list of label substrings
    if only and not any(s.strip() in label for s in only.split(",")):
        return None
    model = pvt.PVTv2(config=cfg, dtype=jnp.bfloat16)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), img))()

    def loss(params, x):
        outs = model.apply(params, x, train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    g = jax.jit(jax.grad(loss))

    def run(v, x):
        gr = g(v, x)
        return jax.tree_util.tree_leaves(gr)[0]

    try:
        t = timed(run, (v, x))
    except Exception as e:  # e.g. no-remat HBM OOM at bs=8
        print(f"{label:30s} FAILED ({type(e).__name__}: {str(e)[:80]})")
        return None
    print(f"{label:30s} {t*1e3:7.2f} ms")
    return t


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    cfg = pvt.PVT_V2_VARIANTS["pvt_v2_b5"]

    bench("b5 grad (full, remat)", cfg, x, img)
    bench("b5 grad (no remat)",
          dataclasses.replace(cfg, remat=False), x, img)

    orig_mixffn = pvt.MixFFN.__call__

    def no_dwconv(self, y, deterministic=True):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)

    pvt.MixFFN.__call__ = nn.compact(no_dwconv)
    try:
        bench("b5 grad (dwconv stubbed)", cfg, x, img)
    finally:
        pvt.MixFFN.__call__ = orig_mixffn

    orig_attn = pvt.SRAttention.__call__

    def q_only(self, y, deterministic=True):
        return nn.Dense(self.dim, dtype=self.dtype, name="q")(y)

    pvt.SRAttention.__call__ = nn.compact(q_only)
    try:
        bench("b5 grad (attention stubbed)", cfg, x, img)
    finally:
        pvt.SRAttention.__call__ = orig_attn

    def ffn_relu(self, y, deterministic=True):
        """fc1 -> dwconv -> RELU -> fc2: isolates the exact-gelu (erf) cost."""
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(y)
        y = nn.Conv(self.hidden, (3, 3), padding=1,
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="dwconv")(y)
        y = nn.relu(y)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)

    def ffn_identity(self, y, deterministic=True):
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)

    for label, fn in (("b5 grad (gelu->relu)", ffn_relu),
                      ("b5 grad (ffn stubbed)", ffn_identity)):
        pvt.MixFFN.__call__ = nn.compact(fn)
        try:
            bench(label, cfg, x, img)
        finally:
            pvt.MixFFN.__call__ = orig_mixffn

    # LayerNorm cost: stub EVERY flax LN's mean/var reductions (constant
    # 0-mean / 1-var), keeping the affine + param tree + scan/remat
    # wrappers intact. Patching flax's module-level _compute_stats (not
    # LayerNorm.__call__) matters: post-hoc method assignment bypasses
    # flax's metaclass method wrapping, so self.param would fail.
    from flax.linen import normalization as fln

    orig_stats = fln._compute_stats

    def stats_stub(x, axes, dtype, *a, **k):
        if isinstance(axes, int):
            axes = (axes,)
        red = tuple(d for i, d in enumerate(x.shape)
                    if i not in {ax % x.ndim for ax in axes})
        dt = jnp.promote_types(jnp.float32, x.dtype)
        return jnp.zeros(red, dt), jnp.ones(red, dt)

    fln._compute_stats = stats_stub
    try:
        bench("b5 grad (LN stats stubbed)", cfg, x, img)
    finally:
        fln._compute_stats = orig_stats


if __name__ == "__main__":
    main()
