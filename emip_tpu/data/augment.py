"""Host-side PIL augmentations, pair-consistent.

Behavior mirrors the reference's training augmentations
(``dataset/data_augment.py``): joint +-15 deg bicubic rotation (p=0.2),
per-image brightness/contrast/color/sharpness jitter, salt-and-pepper noise
on the GT, plus the flip/crop variants used by the alternate flip-augmented
dataset (``dataset/dataset_aug.py``).

All randomness flows through an explicit ``random.Random`` instance so the
pipeline is reproducible and worker-shardable.
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance

__all__ = [
    "joint_rotation",
    "color_jitter",
    "salt_pepper",
    "joint_hflip",
    "joint_vflip",
    "joint_random_crop",
]


def joint_rotation(rng: random.Random, images, prob: float = 0.2,
                   max_deg: int = 15):
    """Rotate all images by one shared random angle with prob ``prob``."""
    if rng.random() > 1.0 - prob:
        angle = rng.randint(-max_deg, max_deg - 1)
        images = [im.rotate(angle, Image.BICUBIC) for im in images]
    return images


def color_jitter(rng: random.Random, image: Image.Image) -> Image.Image:
    image = ImageEnhance.Brightness(image).enhance(rng.randint(5, 15) / 10.0)
    image = ImageEnhance.Contrast(image).enhance(rng.randint(5, 15) / 10.0)
    image = ImageEnhance.Color(image).enhance(rng.randint(0, 20) / 10.0)
    image = ImageEnhance.Sharpness(image).enhance(rng.randint(0, 30) / 10.0)
    return image


def salt_pepper(rng: random.Random, mask: Image.Image,
                ratio: float = 0.0015) -> Image.Image:
    """Salt-and-pepper noise on a grayscale GT mask (vectorized)."""
    arr = np.array(mask)
    n = int(ratio * arr.shape[0] * arr.shape[1])
    if n == 0:
        return mask
    np_rng = np.random.default_rng(rng.getrandbits(32))
    ys = np_rng.integers(0, arr.shape[0], n)
    xs = np_rng.integers(0, arr.shape[1], n)
    vals = np_rng.integers(0, 2, n).astype(arr.dtype) * 255
    arr[ys, xs] = vals
    return Image.fromarray(arr)


def joint_hflip(rng: random.Random, images):
    if rng.randint(0, 1) == 1:
        images = [im.transpose(Image.FLIP_LEFT_RIGHT) for im in images]
    return images


def joint_vflip(rng: random.Random, images):
    if rng.randint(0, 1) == 1:
        images = [im.transpose(Image.FLIP_TOP_BOTTOM) for im in images]
    return images


def joint_random_crop(rng: random.Random, images, border: int = 30):
    w, h = images[0].size
    cw = rng.randint(w - border, w - 1) if w > border else w
    ch = rng.randint(h - border, h - 1) if h > border else h
    region = ((w - cw) >> 1, (h - ch) >> 1, (w + cw) >> 1, (h + ch) >> 1)
    return [im.crop(region) for im in images]
