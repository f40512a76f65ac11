"""Batch inference: prediction dumping for short/long models.

Equivalent of the reference's ``test.py`` / ``test_long.py`` evaluators
(§3.3 of SURVEY.md) with a TPU-friendly twist: frame pairs are batched
through one jitted forward (the reference ran bs=1), and only the
variable-shape post-processing (resize to native size, sigmoid, min-max,
PNG encode) runs on host threads.

PNG output is bit-matched to the reference's
``Image.fromarray(pred*255).convert('L')`` save (test.py:36).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np
from PIL import Image

from emip_tpu.data.pipeline import ClipLoader, PairEvalLoader
from emip_tpu.ops.image import resize_bilinear_np
from emip_tpu.parallel.mesh import fetch_global
from emip_tpu.train.state import merge_params

__all__ = ["predict_pairs", "predict_clips_long", "postprocess_to_png"]


def postprocess_to_png(logits_hw: np.ndarray, orig_hw, path: str) -> None:
    """logits [h, w] -> bilinear resize -> sigmoid -> min-max -> PNG."""
    up = resize_bilinear_np(logits_hw, orig_hw, align_corners=False)
    pred = 1.0 / (1.0 + np.exp(-up))
    pred = (pred - pred.min()) / (pred.max() - pred.min() + 1e-8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(pred * 255).convert("L").save(path)


def _batched(iterable, n):
    buf = []
    for item in iterable:
        buf.append(item)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def predict_pairs(
    model,
    state,
    images_root: str,
    save_path: str,
    size: int = 352,
    dataset_type: str = "MoCA",
    batch_size: int = 8,
    return_flow: bool = False,
    mesh=None,
):
    """Run the short-term model over all frame pairs; save per-video PNGs.

    When ``return_flow`` is set, also yields (video, name, flow_fw) for the
    flow-visualization entry point.

    With a ``mesh`` (or automatically when >1 device is visible), batches
    are sharded along the mesh's 'data' axis so prediction dumping uses
    every chip — the DistributedSampler equivalent for inference.
    """
    if mesh is None and len(jax.devices()) > 1:
        from emip_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if mesh is not None:
        from emip_tpu.parallel.mesh import shard_batch  # noqa: F401

        ndata = mesh.shape["data"]
        batch_size = ((batch_size + ndata - 1) // ndata) * ndata

    variables = {
        "params": merge_params(state.params, state.frozen),
        "batch_stats": state.batch_stats,
    }

    @jax.jit
    def forward(variables, img1, img2):
        # variables passed as argument (not closure) so remote runtimes
        # don't receive params baked into the compile payload
        mask, flow_fw, _ = model.apply(variables, img1, img2, train=False)
        return mask, flow_fw[-1]

    loader = PairEvalLoader(
        images_root, None, size=size, dataset_type=dataset_type, with_gt=False
    )
    results = []
    with ThreadPoolExecutor(8) as pool:
        for chunk in _batched(iter(loader), batch_size):
            n = len(chunk)
            img1 = np.stack([r["image1"] for r in chunk])
            img2 = np.stack([r["image2"] for r in chunk])
            if n < batch_size:  # pad to the compiled batch shape
                pad = batch_size - n
                img1 = np.concatenate([img1, img1[-1:].repeat(pad, 0)])
                img2 = np.concatenate([img2, img2[-1:].repeat(pad, 0)])
            if mesh is not None:
                # the loader is unsharded: every process feeds the full
                # batch, so declare it replicated input (process_local
                # would duplicate rows nproc times in multi-host runs)
                img1, img2 = shard_batch((img1, img2), mesh,
                                         process_local=False)
            masks, flows = forward(variables, img1, img2)
            masks = fetch_global(masks).astype(np.float32)[:n, ..., 0]
            jobs = []
            for rec, logits in zip(chunk, masks):
                out = os.path.join(
                    save_path, rec["video"], rec["frame_name"] + ".png"
                )
                jobs.append(
                    pool.submit(postprocess_to_png, logits, rec["orig_hw"],
                                out)
                )
            if return_flow:
                flows = fetch_global(flows).astype(np.float32)[:n]
                for rec, fl in zip(chunk, flows):
                    results.append((rec["video"], rec["frame_name"], fl))
            for j in jobs:
                j.result()
    return results


def predict_clips_long(
    model,
    variables,
    images_root: str,
    save_path: str,
    size: int = 352,
    dataset_type: str = "MoCA",
):
    """Long-model streaming inference over whole videos.

    Protocol from the reference (test_long.py:29-37): frame 0 pairs with
    frame 1 and uses the short-term mask; later frames use the memory-
    prompted long head with the rolling buffer carried across steps.
    """

    @jax.jit
    def short0(variables, img0, img1):
        return model.apply(
            variables, img0, img1,
            method=lambda m, a, b: m.short_forward(a, b)["mask"],
        )

    @jax.jit
    def step(variables, img_prev, img_cur, state):
        mask_long, _, new_state = model.apply(
            variables, img_prev, img_cur, state, False,
            method=lambda m, a, b, s, t: m.step(a, b, s, t),
        )
        return mask_long, new_state

    loader = ClipLoader(images_root, None, size=size,
                        dataset_type=dataset_type, with_gt=False)
    with ThreadPoolExecutor(8) as pool:
        for clip in loader:
            frames = clip["frames"]
            names = clip["frame_names"]
            video = clip["video"]
            with Image.open(
                _first_frame_path(images_root, video, dataset_type)
            ) as im0:
                orig_hw = (im0.height, im0.width)

            jobs = []
            mask0 = np.asarray(
                short0(variables, frames[0:1], frames[1:2]), np.float32
            )[0, ..., 0]
            jobs.append(pool.submit(
                postprocess_to_png, mask0, orig_hw,
                os.path.join(save_path, video, names[0] + ".png"),
            ))

            state = model.init_memory(1)
            for t in range(1, len(frames)):
                mask, state = step(
                    variables, frames[t - 1 : t], frames[t : t + 1], state
                )
                jobs.append(pool.submit(
                    postprocess_to_png,
                    np.asarray(mask, np.float32)[0, ..., 0], orig_hw,
                    os.path.join(save_path, video, names[t] + ".png"),
                ))
            for j in jobs:
                j.result()


def _first_frame_path(images_root, video, dataset_type):
    from emip_tpu.data.manifest import frames_subdir

    d = os.path.join(images_root, video, frames_subdir(dataset_type))
    return os.path.join(d, sorted(os.listdir(d))[0])
