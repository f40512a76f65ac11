"""Jitted train/eval steps for the short-term two-stream model.

One device program per step (reference hot loop: train.py:33-92 / §3.2):
forward (both streams + flow estimation + decode), hybrid-E segmentation
loss + unsupervised photometric flow loss, backward w.r.t. the trainable
sub-tree only (GMFlow's backward-through-params is never built), element-wise
grad clamp, AdamW. Under a ('data','model') mesh the batch is sharded along
'data'; XLA inserts the gradient all-reduce (the DDP/NCCL equivalent).

BatchNorm note: statistics are computed over the *global* (sharded) batch
inside jit — effectively SyncBN, an improvement over the reference's
per-GPU BN.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from emip_tpu.losses.flow import UnsupFlowLossConfig, unsup_flow_loss
from emip_tpu.losses.seg import hybrid_e_loss
from emip_tpu.train.state import TrainState, merge_params

__all__ = ["make_short_train_step", "make_short_eval_step"]


def make_short_train_step(
    model,
    tx,
    flow_loss_cfg: UnsupFlowLossConfig = UnsupFlowLossConfig(),
    donate: bool = True,
) -> Callable:
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    batch: dict(image1, image2, gt) — NHWC, images ImageNet-normalized,
    gt in [0,1].
    """

    def step(state: TrainState, batch, rng):
        img1, img2, gts = batch["image1"], batch["image2"], batch["gt"]

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            (mask, flow_fw, flow_bw), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img1,
                img2,
                train=True,
                rngs={"droppath": rng, "dropout": rng},
                mutable=["batch_stats"],
            )
            loss_pred = hybrid_e_loss(mask, gts)
            loss_flow, _, mean_abs_flow = unsup_flow_loss(
                list(zip(flow_fw, flow_bw)), img1, img2, flow_loss_cfg
            )
            loss = loss_pred + loss_flow
            aux = dict(
                loss=loss,
                loss_pred=loss_pred,
                loss_flow=loss_flow,
                mean_abs_flow=mean_abs_flow,
                batch_stats=mutated["batch_stats"],
            )
            return loss, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = state._replace(
            step=state.step + 1,
            params=params,
            batch_stats=aux.pop("batch_stats"),
            opt_state=opt_state,
        )
        return new_state, aux

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_short_eval_step(model) -> Callable:
    """Jitted ``eval_step(state, img1, img2) -> (mask_logits, val_loss_fn)``.

    Returns raw full-resolution logits; host-side post-processing (resize to
    GT shape, sigmoid, min-max) lives in the inference pipeline to keep the
    device program shape-static.
    """

    @jax.jit
    def eval_step(state: TrainState, img1, img2):
        mask, _, _ = model.apply(
            {
                "params": merge_params(state.params, state.frozen),
                "batch_stats": state.batch_stats,
            },
            img1,
            img2,
            train=False,
        )
        return mask

    return eval_step
