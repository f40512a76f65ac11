"""Synthetic video fixtures: random datasets mirroring the on-disk layout.

Generates ``<root>/<video>/{Imgs|frames|Frame}/*.jpg`` + ``GT/*.png`` trees
with a moving bright blob (so flow/segmentation losses have signal), used by
tests and smoke runs in place of MoCA/CAD (SURVEY.md §4: dataset-free
synthetic fixtures).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from emip_tpu.data.manifest import frames_subdir

__all__ = ["make_synthetic_video_root", "make_synthetic_static_root"]


def make_synthetic_static_root(
    root: str,
    num_images: int = 8,
    size: tuple[int, int] = (96, 128),
    seed: int = 0,
) -> str:
    """COD10K-style flat Imgs/ + GT/ tree with random blob images."""
    rng = np.random.default_rng(seed)
    h, w = size
    img_dir = os.path.join(root, "Imgs")
    gt_dir = os.path.join(root, "GT")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(num_images):
        bg = rng.integers(0, 255, (h, w, 3), np.uint8)
        cy, cx, r = rng.integers(15, h - 15), rng.integers(15, w - 15), 10
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
        frame = bg.copy()
        frame[blob] = (230, 230, 230)
        Image.fromarray(frame).save(os.path.join(img_dir, f"im_{i:04d}.jpg"),
                                    quality=95)
        Image.fromarray((blob * 255).astype(np.uint8)).save(
            os.path.join(gt_dir, f"im_{i:04d}.png")
        )
    return root


def make_synthetic_video_root(
    root: str,
    num_videos: int = 2,
    frames_per_video: int = 5,
    size: tuple[int, int] = (96, 128),  # (H, W)
    dataset_type: str = "MoCA",
    seed: int = 0,
) -> str:
    """Create a synthetic dataset tree; returns ``root`` (with trailing sep)."""
    rng = np.random.default_rng(seed)
    h, w = size
    sub = frames_subdir(dataset_type)
    for v in range(num_videos):
        vname = f"video_{v:02d}"
        img_dir = os.path.join(root, vname, sub)
        gt_dir = os.path.join(root, vname, "GT")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)

        bg = rng.integers(0, 255, (h, w, 3), np.uint8)
        cy, cx = rng.integers(20, h - 20), rng.integers(20, w - 20)
        dy, dx = rng.integers(-3, 4), rng.integers(-3, 4)
        r = 10
        for t in range(frames_per_video):
            yy, xx = np.mgrid[0:h, 0:w]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
            frame = bg.copy()
            frame[blob] = (220, 220, 220)
            Image.fromarray(frame).save(
                os.path.join(img_dir, f"{t:05d}.jpg"), quality=95
            )
            Image.fromarray((blob * 255).astype(np.uint8)).save(
                os.path.join(gt_dir, f"{t:05d}.png")
            )
            cy = int(np.clip(cy + dy, r, h - r - 1))
            cx = int(np.clip(cx + dx, r, w - r - 1))
    return root if root.endswith(os.sep) else root + os.sep
