"""Long-term model training: per-frame steps with rolling memory.

Semantics from the reference trainer (train_long.py: §3.4 of SURVEY.md):
the short-term net is fully frozen; the LTM heads + fresh injector/decoder
train frame-by-frame over whole videos, with memory key/values *detached*
between frames (truncated BPTT) and an optimizer step per frame. Model
selection is best-by-S-measure (train_long.py:172).

The per-frame step is one jitted device program with the fixed-shape
MemoryState threaded through; frames of one clip stream sequentially (a
data dependency the reference also has), while the batch axis can carry
multiple clips in parallel.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.data.manifest import frames_subdir
from emip_tpu.data.pipeline import ClipLoader
from emip_tpu.losses.seg import hybrid_e_loss
from emip_tpu.metrics import MAE, Smeasure, WeightedFmeasure
from emip_tpu.models.emip_long import EMIPLong
from emip_tpu.ops.image import resize_bilinear_np
from emip_tpu.train.state import (
    SHORT_TERM_FREEZE,
    TrainState,
    build_optimizer,
    cosine_epoch_lr,
    merge_params,
)
from emip_tpu.utils.checkpoint import save_checkpoint
from emip_tpu.utils.config import Config, snapshot_config
from emip_tpu.utils.logging import ScalarLogger, setup_logging

__all__ = [
    "build_long_state",
    "make_long_train_step",
    "make_long_train_scan_step",
    "train_long",
]

log = logging.getLogger("emip_tpu")


def _dtype_of(cfg: Config):
    import jax.numpy as jnp

    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def build_long_state(cfg: Config, short_variables: dict | None = None):
    """EMIPLong + TrainState with the short-term subtree frozen.

    ``short_variables``: variables of a trained EMIPShort to load under
    ``short_term`` (the reference's 'short_term.'+k remap,
    train_long.py:391-402).
    """
    import jax.numpy as jnp
    from flax import traverse_util

    model = EMIPLong(config=cfg.model, memory_size=cfg.memory_size,
                     dtype=_dtype_of(cfg))
    size = cfg.model.inp_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    mem = model.init_memory(1)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(cfg.seed), dummy, dummy, mem,
                           False)
    )()

    from emip_tpu.convert.torch_import import maybe_load_reference_weights_long

    variables = maybe_load_reference_weights_long(variables, cfg)

    if short_variables is not None:
        flat = dict(traverse_util.flatten_dict(variables["params"]))
        for path, val in traverse_util.flatten_dict(
            short_variables["params"]
        ).items():
            key = ("short_term",) + path
            if key in flat:
                flat[key] = val
        variables = dict(variables)
        variables["params"] = traverse_util.unflatten_dict(flat)
        if short_variables.get("batch_stats"):
            bs = dict(traverse_util.flatten_dict(variables["batch_stats"]))
            for path, val in traverse_util.flatten_dict(
                short_variables["batch_stats"]
            ).items():
                key = ("short_term",) + path
                if key in bs:
                    bs[key] = val
            variables["batch_stats"] = traverse_util.unflatten_dict(bs)

    tx = build_optimizer(cfg.optimizer.lr, cfg.optimizer.weight_decay,
                         cfg.clip)
    state = TrainState.create(variables, tx, SHORT_TERM_FREEZE)
    return model, tx, state


def _frame_update(model: EMIPLong, tx) -> Callable:
    """The per-frame parameter update shared by the jitted step variants:
    (state, mem, img_prev, img_cur, gt) -> (state, mem, loss). Optimizer
    steps every frame (reference train_long.py:55-60)."""

    def update(state: TrainState, mem, img_prev, img_cur, gt):
        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            (mask_long, _, new_mem), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img_prev, img_cur, mem, True,
                mutable=["batch_stats"],
            )
            loss = hybrid_e_loss(mask_long, gt)
            return loss, (new_mem, mutated["batch_stats"], loss)

        grads, (new_mem, batch_stats, loss) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        new_state = state._replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return new_state, new_mem, loss

    return update


def make_long_train_step(model: EMIPLong, tx, donate: bool = True) -> Callable:
    """Jitted per-frame step: (state, mem, img_prev, img_cur, gt) ->
    (state, mem, metrics). ``donate=False`` for equivalence tests that
    reuse the inputs."""
    update = _frame_update(model, tx)

    def step(state: TrainState, mem, img_prev, img_cur, gt):
        new_state, new_mem, loss = update(state, mem, img_prev, img_cur, gt)
        return new_state, new_mem, dict(loss=loss)

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_long_train_scan_step(model: EMIPLong, tx,
                              donate: bool = True) -> Callable:
    """K frames per dispatch: (state, mem, prevs, curs, gts) with
    clip-major [B, K, H, W, C] frame stacks -> (state, mem, metrics).

    ``lax.scan`` threads (state, memory) through the SAME per-frame
    update as :func:`make_long_train_step` — the math is identical to K
    sequential dispatches (tests/test_train_long_scan.py) — but the host
    enqueues ONE program per K frames. The per-frame step is only ~21 ms
    of device time at bs=4/352², which a remote or tunneled host cannot
    feed at rate: per-frame dispatch sustains ~33 ms/frame vs ~24 ms at
    K=8 (artifacts/chain_sweep_train_long.log, round 5). The reference
    trains strictly frame-by-frame in Python (train_long.py:49-63).

    K is static per compile (the trailing ``T-1 mod K`` frames of a clip
    go through the per-frame step). metrics["loss"] is the LAST frame's
    loss (matching the per-frame trainer's logging); "loss_mean" averages
    the chunk.
    """
    update = _frame_update(model, tx)

    def step_k(state: TrainState, mem, prevs, curs, gts):
        def body(carry, xs):
            st, m = carry
            new_st, new_m, loss = update(st, m, *xs)
            return (new_st, new_m), loss

        # clip-major in (shard_batch shards leaf axis 0 = clips); scan
        # wants time-major — transpose on device, XLA fuses the copy
        xs = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, 1, 0), (prevs, curs, gts)
        )
        (state, mem), losses = jax.lax.scan(body, (state, mem), xs)
        return state, mem, dict(loss=losses[-1], loss_mean=jnp.mean(losses))

    return jax.jit(step_k, donate_argnums=(0, 1) if donate else ())


def validate_long(model, state, cfg: Config, max_items: int | None = None,
                  dataset: "DatasetConfig | None" = None):
    """Per-frame long-model validation (S-measure etc.).

    ``dataset`` overrides the val split — used for the CAD validation pass
    (the reference defined ``val_cad`` but never wired it and its config
    block was missing, SURVEY.md §7.2; here it runs when
    ``val_dataset_cad`` is configured)."""
    variables = {
        "params": merge_params(state.params, state.frozen),
        "batch_stats": state.batch_stats,
    }

    @jax.jit
    def step(variables, img_prev, img_cur, mem):
        mask, _, new_mem = model.apply(
            variables, img_prev, img_cur, mem, False,
            method=lambda m, a, b, s, t: m.step(a, b, s, t),
        )
        return mask, new_mem

    ds = dataset if dataset is not None else cfg.val_dataset
    loader = ClipLoader(
        ds.image_path, ds.gt_path, size=ds.inp_size,
        dataset_type=ds.dataset_type,
    )
    sm, wfm, mae = Smeasure(), WeightedFmeasure(), MAE()
    n_clips = 0
    for ci, clip in enumerate(loader):
        if max_items is not None and ci >= max_items:
            break
        n_clips += 1
        frames, gts = clip["frames"], clip["gts"]
        mem = model.init_memory(1)
        for t in range(1, len(frames)):
            mask, mem = step(variables, frames[t - 1 : t], frames[t : t + 1], mem)
            logits = np.asarray(mask, np.float32)[0, ..., 0]
            gt = gts[t]
            up = resize_bilinear_np(logits, gt.shape, align_corners=False)
            pred = 1.0 / (1.0 + np.exp(-up))
            pred = (pred - pred.min()) / (pred.max() - pred.min() + 1e-8)
            for m in (sm, wfm, mae):
                m.step(pred * 255.0, gt)
    if n_clips == 0:
        # empty split (e.g. wrong frames-subdir layout for the dataset_type)
        # — surface it instead of silently averaging to NaN
        log.warning(
            "validate_long: 0 clips under %s (dataset_type=%s expects a "
            "'%s' frames subdir); skipping metrics",
            ds.image_path, ds.dataset_type, frames_subdir(ds.dataset_type),
        )
        return {}
    return dict(
        Sm=float(sm.get_results()["sm"]),
        wFm=float(wfm.get_results()["wfm"]),
        MAE=float(mae.get_results()["mae"]),
    )


def _clip_groups(loader, group: int, max_videos: int | None,
                 max_frames: int | None):
    """Stacked clip groups [group, T_min, ...] for data-parallel steps.

    Clips within a group are truncated to the group's shortest clip so the
    frame loop runs in lockstep (static shapes for the jitted step). With
    ``group == 1`` this is exactly the reference's clip-by-clip schedule.
    A trailing partial group is dropped (equal-size batches on every
    process — the loader's shards are equal length, so group counts match
    across processes and the DP collectives stay in sync).
    """
    buf = []
    for vi, clip in enumerate(loader):
        if max_videos is not None and vi >= max_videos:
            break
        buf.append(clip)
        if len(buf) == group:
            t_min = min(len(c["frames"]) for c in buf)
            if max_frames is not None:
                t_min = min(t_min, max_frames)
            yield (
                np.stack([c["frames"][:t_min] for c in buf]),
                np.stack([c["masks"][:t_min] for c in buf]),
            )
            buf = []
    if buf:
        log.info("train_long: dropping %d trailing clip(s) (< group of %d)",
                 len(buf), group)


def train_long(cfg: Config, short_variables: dict | None = None,
               max_videos_per_epoch: int | None = None,
               max_frames_per_video: int | None = None):
    setup_logging(cfg.save_path, "train_long_log.log")
    snapshot_config(cfg, cfg.save_path)
    scalars = ScalarLogger(cfg.save_path)

    model, tx, state = build_long_state(cfg, short_variables)
    step_fn = make_long_train_step(model, tx)
    k = max(1, int(cfg.long_frames_per_dispatch))
    scan_fn = make_long_train_scan_step(model, tx) if k > 1 else None

    from emip_tpu.data.pipeline import default_shard
    from emip_tpu.parallel.mesh import make_mesh, shard_batch

    # Data-parallel over the full mesh: each data-axis slot streams one
    # clip, gradients sync per frame-step via GSPMD's psum (the trainer
    # was previously a plain single-device loop — with sharded loaders in
    # a multi-host run, replicas would silently diverge with no grad sync).
    mesh = make_mesh()
    ndata = mesh.shape["data"]
    nproc = jax.process_count()
    assert ndata % nproc == 0, (ndata, nproc)
    local_clips = ndata // nproc

    loader = ClipLoader(
        cfg.train_dataset.image_path, cfg.train_dataset.gt_path,
        size=cfg.train_dataset.inp_size,
        dataset_type=cfg.train_dataset.dataset_type,
        shuffle=True, seed=cfg.seed,
        shard=default_shard(),  # per-process clips in multi-host runs
    )
    lr_fn = cosine_epoch_lr(cfg.optimizer.lr, cfg.lr_min, cfg.epoch_max)
    ckpt_dir = os.path.join(cfg.save_path, "ckpt_long")
    best_dir = os.path.join(cfg.save_path, "ckpt_long_best")

    best_sm, best_epoch = -1.0, 0
    global_step = 0
    for epoch in range(1, cfg.epoch):
        state = state.set_learning_rate(lr_fn(epoch))
        t0 = time.perf_counter()
        for frames, masks in _clip_groups(
            loader, local_clips, max_videos_per_epoch, max_frames_per_video
        ):
            # frames [local_clips, T, H, W, 3]; memory ring sharded on the
            # clip axis like the frame batch
            mem = shard_batch(model.init_memory(local_clips), mesh)
            t, T = 1, frames.shape[1]
            # K frames per dispatch (identical math to per-frame steps —
            # lax.scan threads state+memory); the T-1 mod K tail runs
            # through the per-frame program
            while scan_fn is not None and T - t >= k:
                batch = shard_batch(
                    (frames[:, t - 1 : t - 1 + k], frames[:, t : t + k],
                     masks[:, t : t + k]), mesh
                )
                state, mem, metrics = scan_fn(state, mem, *batch)
                global_step += k
                t += k
            while t < T:
                batch = shard_batch(
                    (frames[:, t - 1], frames[:, t], masks[:, t]), mesh
                )
                state, mem, metrics = step_fn(state, mem, *batch)
                global_step += 1
                t += 1
            scalars.scalar("loss/long", float(metrics["loss"]), global_step)
        scalars.scalar("time/epoch_s", time.perf_counter() - t0, epoch)

        if cfg.epoch_save and epoch % cfg.epoch_save == 0:
            save_checkpoint(ckpt_dir, state, epoch)
        if cfg.epoch_val and epoch % cfg.epoch_val == 0:
            metrics = validate_long(model, state, cfg)
            scalars.scalars({f"val_long/{k}": v for k, v in metrics.items()},
                            epoch)
            log.info("[Val-long] epoch %d %s", epoch, metrics)
            if cfg.val_dataset_cad is not None:
                cad = validate_long(model, state, cfg,
                                    dataset=cfg.val_dataset_cad)
                scalars.scalars(
                    {f"val_long_cad/{k}": v for k, v in cad.items()}, epoch
                )
                log.info("[Val-long-CAD] epoch %d %s", epoch, cad)
            if metrics.get("Sm", float("-inf")) > best_sm:
                best_sm, best_epoch = metrics["Sm"], epoch
                save_checkpoint(best_dir, state, epoch, max_to_keep=1)

    scalars.close()
    return state, dict(best_sm=best_sm, best_epoch=best_epoch)
