"""Precomputed-flow inputs: .flo readers and a pair+flow loader.

Catalogued alternate of the reference's ``dataset/dataset_flow_jpg.py``
(unimported there, and with a broken ``flow_viz`` import — SURVEY.md §2.2):
training pairs accompanied by precomputed optical flow, either Middlebury
``.flo`` fields or color-wheel JPG renderings.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from emip_tpu.data.manifest import PairItem, scan_pairs

__all__ = ["read_flo", "write_flo", "PairFlowLoader"]

_FLO_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo -> [H, W, 2] float32 (x, y)."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, 1)[0]
        if magic != np.float32(_FLO_MAGIC):
            raise ValueError(f"{path}: bad .flo magic {magic}")
        w = int(np.fromfile(f, np.int32, 1)[0])
        h = int(np.fromfile(f, np.int32, 1)[0])
        data = np.fromfile(f, np.float32, 2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    h, w, c = flow.shape
    assert c == 2
    with open(path, "wb") as f:
        np.float32(_FLO_MAGIC).tofile(f)
        np.int32(w).tofile(f)
        np.int32(h).tofile(f)
        flow.astype(np.float32).tofile(f)


class PairFlowLoader:
    """Frame-pair loader that also yields precomputed flow.

    Flow files live in ``<video>/Flow/`` named after the first frame of the
    pair, as ``.flo`` fields or flow-colored ``.jpg`` images (returned raw
    as uint8 RGB in that case).
    """

    def __init__(self, images_root: str, gts_root: str, size: int = 352,
                 dataset_type: str = "MoCA"):
        from emip_tpu.data.pipeline import (  # lazy: avoid import cycle
            _load_gray,
            _load_rgb,
            _to_mask_array,
            _to_norm_array,
        )

        self._loaders = (_load_rgb, _load_gray, _to_norm_array,
                         _to_mask_array)
        self.items = scan_pairs(images_root, gts_root, dataset_type)
        self.size = size

    def _flow_path(self, item: PairItem) -> str | None:
        flow_dir = os.path.join(os.path.dirname(os.path.dirname(item.image1)),
                                "Flow")
        for ext in (".flo", ".jpg", ".png"):
            p = os.path.join(flow_dir, item.frame_name + ext)
            if os.path.isfile(p):
                return p
        return None

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        load_rgb, load_gray, to_norm, to_mask = self._loaders
        for item in self.items:
            rec = dict(
                image1=to_norm(load_rgb(item.image1), self.size),
                image2=to_norm(load_rgb(item.image2), self.size),
                gt=to_mask(load_gray(item.gt), self.size),
                video=item.video,
                frame_name=item.frame_name,
            )
            fp = self._flow_path(item)
            if fp is not None:
                if fp.endswith(".flo"):
                    rec["flow"] = read_flo(fp)
                else:
                    rec["flow_rgb"] = np.asarray(load_rgb(fp), np.uint8)
            yield rec
