#!/usr/bin/env python
"""Static-image pretraining of the segmentation stream (COD10K path).

The reference implies this stage via its COD10K-pretrained checkpoint
(``load.type: COD10K``, configs.yaml:22) but ships no trainer for it; this
entry point trains :class:`SegNetwork` (backbone + reductions + NCD) with
the hybrid E-measure loss on a flat image/GT dataset — BASELINE.json
config #2.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emip_tpu.data.pipeline import StaticImageLoader
from emip_tpu.losses.seg import hybrid_e_loss
from emip_tpu.models.emip_short import SegNetwork
from emip_tpu.parallel.mesh import make_mesh, shard_batch
from emip_tpu.train.state import build_optimizer, cosine_epoch_lr
from emip_tpu.utils.checkpoint import save_checkpoint
from emip_tpu.utils.config import load_config
from emip_tpu.utils.logging import ScalarLogger, setup_logging


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/emip.yaml")
    parser.add_argument("--data_root", required=True,
                        help="COD10K-style root with Imgs/ + GT/")
    parser.add_argument("--save_path", default=None)
    parser.add_argument("--max_steps_per_epoch", type=int, default=None)
    args = parser.parse_args()

    cfg = load_config(args.config)
    save_path = args.save_path or os.path.join(cfg.save_path, "static")
    log = setup_logging(save_path, "train_static_log.log")
    scalars = ScalarLogger(save_path)

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = SegNetwork(backbone_name=cfg.model.backbone_name,
                       channel=cfg.model.channel, dtype=dtype)
    size = cfg.model.inp_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(cfg.seed), dummy, train=False)
    )()

    tx = build_optimizer(cfg.optimizer.lr, cfg.optimizer.weight_decay,
                         cfg.clip)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, rng):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["image"], train=True,
                rngs={"droppath": rng},
                mutable=["batch_stats"],
            )
            return hybrid_e_loss(logits, batch["gt"]), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    mesh = make_mesh()
    from emip_tpu.data.pipeline import default_shard

    loader = StaticImageLoader(args.data_root,
                               batch_size=cfg.train_dataset.batch_size,
                               size=size, seed=cfg.seed,
                               shard=default_shard())
    lr_fn = cosine_epoch_lr(cfg.optimizer.lr, cfg.lr_min, cfg.epoch_max)
    rng = jax.random.PRNGKey(cfg.seed)

    for epoch in range(1, cfg.epoch):
        # set injected LR
        inject = opt_state[1]
        hyper = dict(inject.hyperparams)
        hyper["learning_rate"] = jnp.asarray(lr_fn(epoch), jnp.float32)
        opt_state = (opt_state[0], inject._replace(hyperparams=hyper))

        t0 = time.perf_counter()
        for i, batch in enumerate(loader, start=1):
            if args.max_steps_per_epoch and i > args.max_steps_per_epoch:
                break
            rng, srng = jax.random.split(rng)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, shard_batch(batch, mesh), srng
            )
            if i % 20 == 0 or i == 1:
                log.info("[Static] epoch %d step %d loss %.4f",
                         epoch, i, float(loss))
                scalars.scalar("loss/static", float(loss), epoch * 100000 + i)
        scalars.scalar("time/epoch_s", time.perf_counter() - t0, epoch)
        save_checkpoint(os.path.join(save_path, "ckpt"), dict(
            params=params, batch_stats=batch_stats
        ), epoch)
    scalars.close()
    print(">>> static pretrain done")


if __name__ == "__main__":
    main()
