"""Training loops: short-term two-stream training with in-loop validation.

Orchestration mirrors the reference's trainer (train.py: §3.1 of SURVEY.md):
per-epoch cosine LR (stepped before the epoch), per-step loss logging,
periodic validation computing wFm/Sm/MAE over the val split, and
best-by-MAE checkpointing — plus what the reference lacked: optimizer-state
checkpointing with resume, step timing, and an interrupt-safe save.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from emip_tpu.data.pipeline import PairEvalLoader, PairTrainLoader
from emip_tpu.metrics import MAE, Smeasure, WeightedFmeasure
from emip_tpu.models.emip_short import EMIPShort
from emip_tpu.ops.image import resize_bilinear_np
from emip_tpu.parallel.mesh import fetch_global, make_mesh, shard_batch
from emip_tpu.train.short import make_short_eval_step, make_short_train_step
from emip_tpu.train.state import (
    GMFLOW_FREEZE,
    TrainState,
    build_optimizer,
    cosine_epoch_lr,
)
from emip_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from emip_tpu.utils.config import Config, snapshot_config
from emip_tpu.utils.logging import ScalarLogger, setup_logging


@jax.jit
def _val_loss_per_frame(logits, gts):
    """Per-frame hybrid-E losses for a batch, one device program."""
    from emip_tpu.losses.seg import hybrid_e_loss

    return jax.vmap(lambda a, b: hybrid_e_loss(a[None], b[None]))(logits, gts)

__all__ = ["build_short_state", "train_short", "validate_short"]

log = logging.getLogger("emip_tpu")


def _dtype_of(cfg: Config):
    import jax.numpy as jnp

    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def build_short_state(cfg: Config, load_pretrained: bool = True):
    """Model + initialized TrainState (optionally with converted weights)."""
    import jax.numpy as jnp

    model = EMIPShort(config=cfg.model, dtype=_dtype_of(cfg))
    size = cfg.model.inp_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(cfg.seed), dummy, dummy,
                           train=False)
    )()

    if load_pretrained:
        from emip_tpu.convert.torch_import import maybe_load_reference_weights

        variables = maybe_load_reference_weights(variables, cfg)

    tx = build_optimizer(cfg.optimizer.lr, cfg.optimizer.weight_decay,
                         cfg.clip)
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)
    return model, tx, state


def validate_short(model, state, cfg: Config, max_items: int | None = None,
                   eval_step=None, batch_size: int = 8, mesh=None):
    """wFm / Sm / MAE / val-loss over the validation split.

    Post-processing parity with the reference (train.py:131-137): logits
    upsampled (bilinear, align_corners=False) to native GT size, sigmoid,
    per-frame min-max normalization, metrics at native resolution.

    Pass a prebuilt ``eval_step`` to reuse the compiled forward across
    epochs (a fresh jit wrapper per call would recompile every time).
    Pairs are batched through the device (the reference validated at bs=1;
    per-call host round-trips dominate at that size on remote runtimes) —
    metrics are per-frame so results are identical.

    With a ``mesh``, eval batches are sharded along 'data' so validation
    uses every chip (the reference shards val via DistributedSampler,
    dataset/dataset.py:137-146); batch_size is rounded up to a multiple
    of the data-axis size.
    """
    if eval_step is None:
        eval_step = make_short_eval_step(model)
    if mesh is not None:
        ndata = mesh.shape["data"]
        batch_size = ((batch_size + ndata - 1) // ndata) * ndata
    loader = PairEvalLoader(
        cfg.val_dataset.image_path,
        cfg.val_dataset.gt_path,
        size=cfg.val_dataset.inp_size,
        dataset_type=cfg.val_dataset.dataset_type,
        with_gt=True,
    )
    wfm, sm, mae = WeightedFmeasure(), Smeasure(), MAE()
    val_loss, n = 0.0, 0

    def batches():
        buf = []
        for i, rec in enumerate(loader):
            if max_items is not None and i >= max_items:
                break
            buf.append(rec)
            if len(buf) == batch_size:
                yield buf
                buf = []
        if buf:
            yield buf

    for chunk in batches():
        k = len(chunk)
        img1 = np.stack([r["image1"] for r in chunk])
        img2 = np.stack([r["image2"] for r in chunk])
        if k < batch_size:  # pad to the compiled shape
            pad = batch_size - k
            img1 = np.concatenate([img1, img1[-1:].repeat(pad, 0)])
            img2 = np.concatenate([img2, img2[-1:].repeat(pad, 0)])
        if mesh is not None:
            # every process iterates the FULL val split identically (the
            # loader is unsharded), so the batch is declared replicated
            # input, not per-process rows
            img1, img2 = shard_batch((img1, img2), mesh, process_local=False)
        logits_dev = eval_step(state, img1, img2)
        logits_all = fetch_global(logits_dev).astype(np.float32)[:k]
        # one batched device program for the whole chunk's val loss
        # (was one un-jitted per-frame hybrid_e_loss call each — hundreds
        # of tiny device programs per validation pass)
        gts = np.stack([r["gt_resized"] for r in chunk])
        losses = np.asarray(_val_loss_per_frame(logits_all, gts))
        val_loss += float(losses.sum())
        n += k
        for rec, logits in zip(chunk, logits_all):
            gt = rec["gt"]
            up = resize_bilinear_np(logits[..., 0], gt.shape,
                                    align_corners=False)
            pred = 1.0 / (1.0 + np.exp(-up))
            pred = (pred - pred.min()) / (pred.max() - pred.min() + 1e-8)
            # metrics re-normalize from the uint8 scale (reference protocol)
            pred255 = pred * 255.0
            wfm.step(pred255, gt)
            sm.step(pred255, gt)
            mae.step(pred255, gt)
    return dict(
        wFm=float(wfm.get_results()["wfm"]),
        Sm=float(sm.get_results()["sm"]),
        MAE=float(mae.get_results()["mae"]),
        val_loss=val_loss / max(n, 1),
    )


def train_short(cfg: Config, resume: bool = False,
                max_steps_per_epoch: int | None = None):
    setup_logging(cfg.save_path)
    snapshot_config(cfg, cfg.save_path)
    scalars = ScalarLogger(cfg.save_path)

    par = cfg.parallel
    mesh = make_mesh(model_parallel=par.model_parallel)
    model, tx, state = build_short_state(cfg)
    train_step = make_short_train_step(model, tx)
    eval_step = make_short_eval_step(model)

    ckpt_dir = os.path.join(cfg.save_path, "ckpt")
    best_dir = os.path.join(cfg.save_path, "ckpt_best")
    start_epoch = 1
    if resume:
        try:
            state, step = restore_checkpoint(ckpt_dir, state)
            start_epoch = int(step) + 1
            log.info("resumed from epoch %d", step)
        except FileNotFoundError:
            log.info("no checkpoint to resume; starting fresh")

    if par.model_parallel > 1 or par.fsdp:
        # tensor-parallel / FSDP weight + optimizer sharding; the jitted
        # step is unchanged (GSPMD inserts the collectives). Default is the
        # reference's regime: replicated params, data-sharded batch.
        from emip_tpu.parallel.sharding import shard_pytree, state_shardings

        state = shard_pytree(
            state,
            state_shardings(
                state, mesh, tp=par.model_parallel > 1, fsdp=par.fsdp
            ),
        )
        log.info(
            "TrainState sharded: mesh %s, tensor-parallel=%d, fsdp=%s, "
            "sequence-parallel=%s",
            dict(mesh.shape), par.model_parallel, par.fsdp,
            par.sequence_parallel,
        )

    from emip_tpu.data.pipeline import default_shard

    loader = PairTrainLoader(
        cfg.train_dataset.image_path,
        cfg.train_dataset.gt_path,
        batch_size=cfg.train_dataset.batch_size,
        size=cfg.train_dataset.inp_size,
        dataset_type=cfg.train_dataset.dataset_type,
        seed=cfg.seed,
        augment=True,
        # multi-host: each process loads a disjoint manifest shard
        # (DistributedSampler equivalent); shard_batch assembles the
        # global batch across processes
        shard=default_shard(),
    )
    lr_fn = cosine_epoch_lr(cfg.optimizer.lr, cfg.lr_min, cfg.epoch_max)

    best_mae, best_epoch = float("inf"), 0
    rng = jax.random.PRNGKey(cfg.seed)
    global_step = 0

    # reference loop range(1, epoch) -> epochs 1..epoch-1 (SURVEY.md §7.13)
    for epoch in range(start_epoch, cfg.epoch):
        lr = lr_fn(epoch)
        state = state.set_learning_rate(lr)
        scalars.scalar("learning_rate", lr, epoch)

        # device-side accumulation: no host sync until epoch end
        epoch_loss, epoch_steps = None, 0
        t_epoch = time.perf_counter()
        try:
            for i, batch in enumerate(loader, start=1):
                if max_steps_per_epoch is not None and i > max_steps_per_epoch:
                    break
                rng, step_rng = jax.random.split(rng)
                state, metrics = train_step(
                    state,
                    shard_batch(batch, mesh, sp=par.sequence_parallel),
                    step_rng,
                )
                global_step += 1
                epoch_steps += 1
                epoch_loss = (
                    metrics["loss"] if epoch_loss is None
                    else epoch_loss + metrics["loss"]
                )
                if i % 20 == 0 or i == 1:
                    m = {k: float(v) for k, v in metrics.items()}
                    log.info(
                        "[Train] epoch %d step %d loss %.4f pred %.4f flow %.4f",
                        epoch, i, m["loss"], m["loss_pred"], m["loss_flow"],
                    )
                    scalars.scalars(
                        {f"loss/{k}": v for k, v in m.items()}, global_step
                    )
        except KeyboardInterrupt:
            # interrupt-safe save (reference train.py:85-92), then re-raise
            save_checkpoint(ckpt_dir, state, epoch)
            raise

        dt = time.perf_counter() - t_epoch
        scalars.scalar("time/epoch_s", dt, epoch)
        if epoch_steps:
            scalars.scalar(
                "time/steps_per_s", epoch_steps / dt, epoch
            )
            # per-epoch mean loss (reference train.py:84), one host sync
            scalars.scalar(
                "loss/epoch_mean", float(epoch_loss) / epoch_steps, epoch
            )

        if cfg.epoch_save and epoch % cfg.epoch_save == 0:
            save_checkpoint(ckpt_dir, state, epoch)

        if cfg.epoch_val and epoch % cfg.epoch_val == 0:
            metrics = validate_short(model, state, cfg, eval_step=eval_step,
                                     mesh=mesh)
            scalars.scalars({f"val/{k}": v for k, v in metrics.items()}, epoch)
            log.info("[Val] epoch %d %s", epoch, metrics)
            if metrics["MAE"] < best_mae:
                best_mae, best_epoch = metrics["MAE"], epoch
                save_checkpoint(best_dir, state, epoch, max_to_keep=1)
                log.info("[Val] new best (MAE %.5f) at epoch %d",
                         best_mae, epoch)

    scalars.close()
    return state, dict(best_mae=best_mae, best_epoch=best_epoch)
