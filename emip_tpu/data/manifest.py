"""Dataset manifests: frame-pair and clip lists from video directory trees.

Directory-walking semantics match the reference loaders
(``dataset/dataset.py:24-62,157-183``; clip variant
``dataset/dataset_long_acc.py``):

  <root>/<video>/<frames_subdir>/*.{jpg,png}   (sorted)
  <root>/<video>/GT/*.{png,tif}                (sorted)

* pair (frame_i, frame_{i+1}) is supervised by GT of frame_i;
* the *last* GT of each video is dropped (one fewer pair than frames);
* frame/GT basename alignment is asserted;
* the frames subdir is 'Imgs' for MoCA, 'frames' for CAD,
  'Frame' for pseudo-labeled MoCA.

Videos are iterated in sorted order (deterministic, unlike the reference's
``os.listdir`` — SURVEY.md §7, "nondeterministic reference data order").
"""

from __future__ import annotations

import dataclasses
import os

__all__ = ["frames_subdir", "scan_pairs", "scan_clips", "PairItem", "ClipItem"]

_IMG_EXT = (".jpg", ".png")
_GT_EXT = (".png", ".tif")


def frames_subdir(dataset_type: str) -> str:
    if "CAD" in dataset_type:
        return "frames"
    if "pseudo" in dataset_type:
        return "Frame"
    return "Imgs"


@dataclasses.dataclass(frozen=True)
class PairItem:
    image1: str
    image2: str
    gt: str | None
    video: str
    frame_name: str  # basename (no ext) of image1


@dataclasses.dataclass(frozen=True)
class ClipItem:
    video: str
    frames: tuple[str, ...]
    gts: tuple[str, ...]
    frame_names: tuple[str, ...]


def _list(dirpath: str, exts) -> list[str]:
    if not os.path.isdir(dirpath):
        return []
    return sorted(
        os.path.join(dirpath, f)
        for f in os.listdir(dirpath)
        if f.lower().endswith(exts)
    )


def _stem(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def scan_pairs(
    images_root: str,
    gts_root: str | None = None,
    dataset_type: str = "MoCA",
    require_gt: bool = True,
) -> list[PairItem]:
    """Consecutive-frame pair list over all videos under ``images_root``."""
    sub = frames_subdir(dataset_type)
    items: list[PairItem] = []
    for video in sorted(os.listdir(images_root)):
        vdir = os.path.join(images_root, video)
        if not os.path.isdir(vdir):
            continue
        frames = _list(os.path.join(vdir, sub), _IMG_EXT)
        if len(frames) < 2:
            continue
        gts: list[str | None]
        if require_gt:
            assert gts_root is not None
            gt_all = _list(os.path.join(gts_root, video, "GT"), _GT_EXT)
            gts = gt_all[:-1]  # drop the last GT (reference dataset.py:33)
            assert len(gts) == len(frames) - 1, (
                f"{video}: {len(frames)} frames vs {len(gts)} usable GTs"
            )
        else:
            gts = [None] * (len(frames) - 1)
        for i in range(len(frames) - 1):
            if gts[i] is not None:
                assert _stem(frames[i]) == _stem(gts[i]), (frames[i], gts[i])
            items.append(
                PairItem(
                    image1=frames[i],
                    image2=frames[i + 1],
                    gt=gts[i],
                    video=video,
                    frame_name=_stem(frames[i]),
                )
            )
    return items


def scan_clips(
    images_root: str,
    gts_root: str | None = None,
    dataset_type: str = "MoCA",
    require_gt: bool = True,
) -> list[ClipItem]:
    """Whole-video clip list (long-term training / inference)."""
    sub = frames_subdir(dataset_type)
    clips: list[ClipItem] = []
    for video in sorted(os.listdir(images_root)):
        vdir = os.path.join(images_root, video)
        if not os.path.isdir(vdir):
            continue
        frames = _list(os.path.join(vdir, sub), _IMG_EXT)
        if len(frames) < 2:
            continue
        if require_gt:
            assert gts_root is not None
            gts = tuple(_list(os.path.join(gts_root, video, "GT"), _GT_EXT))
        else:
            gts = ()
        clips.append(
            ClipItem(
                video=video,
                frames=tuple(frames),
                gts=gts,
                frame_names=tuple(_stem(f) for f in frames),
            )
        )
    return clips
