#!/usr/bin/env python
"""Training-step throughput of the flagship model (single chip).

Full train step: forward (both streams), hybrid-E + photometric losses,
backward over the trainable sub-tree, element-wise clip, AdamW. Uses the
dependency-chained differential timing from bench.py (see its docstring).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
from emip_tpu.train.short import make_short_train_step
from emip_tpu.train.state import GMFLOW_FREEZE, TrainState, build_optimizer

BS = int(os.environ.get("BENCH_TRAIN_BS", "8"))
SIZE = 352


def main():
    config = EMIPShortConfig()
    remat = os.environ.get("BENCH_TRAIN_REMAT", "1")  # "0" | "1" | a policy
    dwconv = os.environ.get("BENCH_TRAIN_DWCONV", "conv")  # "conv" | "shift"
    gelu = os.environ.get("BENCH_TRAIN_GELU", "exact")  # "exact" | "poly"
    dpr = os.environ.get("BENCH_TRAIN_DPR")  # e.g. "0" — bounds the
    # per-block droppath rng/mask cost inside the stage scans
    if remat != "1" or dwconv != "conv" or gelu != "exact" or dpr:
        import dataclasses

        from emip_tpu.models.backbones import register_backbone
        from emip_tpu.models.pvt_v2 import PVT_V2_VARIANTS, PVTv2

        cfg_alt = PVT_V2_VARIANTS["pvt_v2_b5"]
        if remat == "0":
            cfg_alt = dataclasses.replace(cfg_alt, remat=False)
            print("# remat disabled")
        elif remat != "1":  # a jax.checkpoint_policies name, e.g. "dots"
            cfg_alt = dataclasses.replace(cfg_alt, remat_policy=remat)
            print(f"# remat policy: {remat}")
        if dwconv != "conv":
            cfg_alt = dataclasses.replace(cfg_alt, ffn_dwconv=dwconv)
            print(f"# dwconv impl: {dwconv}")
        if gelu != "exact":
            cfg_alt = dataclasses.replace(cfg_alt, ffn_gelu=gelu)
            print(f"# gelu impl: {gelu}")
        if dpr:
            cfg_alt = dataclasses.replace(cfg_alt,
                                          drop_path_rate=float(dpr))
            print(f"# drop_path_rate: {dpr}")
        register_backbone(
            "pvt_v2_b5_alt",
            lambda dtype: PVTv2(config=cfg_alt, dtype=dtype),
            cfg_alt.embed_dims,
        )
        config = EMIPShortConfig(backbone_name="pvt_v2_b5_alt")
    model = EMIPShort(config=config, dtype=jnp.bfloat16)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img, img, train=False)
    )()
    if os.environ.get("BENCH_TRAIN_OPT") == "sgd":
        # diagnostic: bounds the AdamW-update + clip share of the step
        import optax

        print("# optimizer: plain SGD (diagnostic)")
        tx = optax.sgd(1e-5)
    else:
        tx = build_optimizer()
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)
    wtable = os.environ.get("BENCH_TRAIN_WARP_TABLE")  # e.g. "bfloat16"
    if wtable:
        from emip_tpu.losses.flow import UnsupFlowLossConfig

        print(f"# warp table dtype: {wtable}")
        step = make_short_train_step(
            model, tx,
            flow_loss_cfg=UnsupFlowLossConfig(warp_table_dtype=wtable),
            donate=True)
    else:
        step = make_short_train_step(model, tx, donate=True)

    rng = np.random.default_rng(0)
    batch = dict(
        image1=jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)),
                           jnp.float32),
        image2=jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)),
                           jnp.float32),
        gt=jnp.asarray(rng.uniform(size=(BS, SIZE, SIZE, 1)) > 0.5,
                       jnp.float32),
    )

    def run(n, state):
        key = jax.random.PRNGKey(0)
        loss = None
        for _ in range(n):
            key, sk = jax.random.split(key)
            state, metrics = step(state, batch, sk)
            loss = metrics["loss"]
        return float(loss), state

    _, state = run(2, state)  # compile + warmup
    t0 = time.perf_counter()
    _, state = run(3, state)
    t1 = time.perf_counter()
    _, state = run(13, state)
    t2 = time.perf_counter()
    step_s = ((t2 - t1) - (t1 - t0)) / 10
    print(f"train step bs={BS}: {step_s * 1e3:.1f} ms -> "
          f"{BS / step_s:.1f} pairs/s")


if __name__ == "__main__":
    main()
