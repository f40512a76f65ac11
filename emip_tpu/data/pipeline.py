"""Host data pipeline: threaded decode/augment -> pinned numpy batches.

TPU-native replacement for the reference's DataLoader stack
(``dataset/dataset.py:133-153`` + worker processes): a thread pool decodes
and augments PIL frames while the accelerator trains, with a bounded
prefetch queue of ready NHWC numpy batches. The training loop overlaps
host->HBM transfer with compute via ``shard_batch`` on the mesh.

Preprocessing parity with the reference: PIL bilinear resize to the square
input size, [0,1] scaling, ImageNet normalization (dataset.py:76-82); GT
resized the same way without normalization.
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

from emip_tpu.data import augment as aug
from emip_tpu.data.manifest import ClipItem, PairItem, scan_clips, scan_pairs
from emip_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["PairTrainLoader", "PairEvalLoader", "ClipLoader",
           "load_pair_arrays", "shard_order", "default_shard"]

_MEAN = np.asarray(IMAGENET_MEAN, np.float32)
_STD = np.asarray(IMAGENET_STD, np.float32)


def _load_rgb(path: str) -> Image.Image:
    with open(path, "rb") as f:
        return Image.open(f).convert("RGB")


def _load_gray(path: str) -> Image.Image:
    with open(path, "rb") as f:
        return Image.open(f).convert("L")


def _to_norm_array(img: Image.Image, size: int | None) -> np.ndarray:
    if size is not None and img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - _MEAN) / _STD


def _to_mask_array(img: Image.Image, size: int | None) -> np.ndarray:
    if size is not None and img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return (np.asarray(img, np.float32) / 255.0)[..., None]


def shard_order(order: list, index: int, count: int) -> list:
    """Per-process slice of an epoch order — DistributedSampler semantics.

    The reference shards its datasets across DDP ranks with
    ``torch.utils.data.DistributedSampler`` (dataset/dataset.py:138-141):
    pad the (already shuffled) index list by wrapping to the front until it
    divides ``count``, then give rank ``index`` the strided slice
    ``padded[index::count]``. All ranks shuffle with the same seed, so the
    shards are disjoint (up to the wrap padding) and cover every item.
    """
    assert 0 <= index < count, (index, count)
    if not order:
        return []
    per = -(-len(order) // count)  # ceil
    pad = per * count - len(order)
    padded = list(order)
    while pad > 0:  # wrap (possibly multiple times for tiny datasets)
        padded += order[: pad]
        pad = per * count - len(padded)
    return padded[index::count]


def default_shard() -> tuple[int, int] | None:
    """(process_index, process_count) in a multi-process run, else None."""
    import jax

    n = jax.process_count()
    return (jax.process_index(), n) if n > 1 else None


def load_pair_arrays(item: PairItem, size: int):
    """Eval-path loading of one pair (no augmentation)."""
    img1 = _load_rgb(item.image1)
    orig_hw = (img1.height, img1.width)
    a = _to_norm_array(img1, size)
    b = _to_norm_array(_load_rgb(item.image2), size)
    return a, b, orig_hw


class PairTrainLoader:
    """Shuffled, augmented, batched frame-pair loader with prefetch."""

    def __init__(
        self,
        images_root: str,
        gts_root: str,
        batch_size: int,
        size: int = 352,
        dataset_type: str = "MoCA",
        seed: int = 123,
        num_workers: int = 8,
        prefetch: int = 4,
        augment: bool = True,
        flip_augment: bool = False,
        drop_remainder: bool = True,
        shard: tuple[int, int] | None = None,
    ):
        self.items = scan_pairs(images_root, gts_root, dataset_type)
        self.batch_size = batch_size
        self.size = size
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.augment = augment
        self.flip_augment = flip_augment
        # sharded loaders must drop the remainder: with it kept, a final
        # short batch could differ in row count across processes once a
        # caller composes shard with truncation/padding, and
        # make_array_from_process_local_data would then desync collectives
        assert shard is None or drop_remainder, (
            "shard requires drop_remainder=True (equal per-process batches)"
        )
        self.drop_remainder = drop_remainder
        self.shard = shard  # (process_index, process_count) or None
        self.epoch = 0

    def _epoch_items(self) -> int:
        if self.shard is None:
            return len(self.items)
        return len(shard_order(list(range(len(self.items))), *self.shard))

    def __len__(self):
        n_items = self._epoch_items()
        n = n_items // self.batch_size
        if not self.drop_remainder and n_items % self.batch_size:
            n += 1
        return n

    def _load_one(self, item: PairItem, rng: random.Random):
        img1 = _load_rgb(item.image1)
        img2 = _load_rgb(item.image2)
        gt = _load_gray(item.gt)
        if self.augment:
            img1, img2, gt = aug.joint_rotation(rng, [img1, img2, gt])
            if self.flip_augment:
                img1, img2, gt = aug.joint_hflip(rng, [img1, img2, gt])
                img1, img2, gt = aug.joint_vflip(rng, [img1, img2, gt])
            img1 = aug.color_jitter(rng, img1)
            img2 = aug.color_jitter(rng, img2)
            gt = aug.salt_pepper(rng, gt)
        return (
            _to_norm_array(img1, self.size),
            _to_norm_array(img2, self.size),
            _to_mask_array(gt, self.size),
        )

    def __iter__(self):
        self.epoch += 1
        order = list(range(len(self.items)))
        shuffle_rng = random.Random(f"{self.seed}:{self.epoch}")
        shuffle_rng.shuffle(order)
        if self.shard is not None:
            order = shard_order(order, *self.shard)

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_remainder:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for bi, idxs in enumerate(batches):
                    rngs = [
                        random.Random(f"{self.seed}:{self.epoch}:{bi}:{j}")
                        for j in range(len(idxs))
                    ]
                    results = list(
                        pool.map(
                            lambda t: self._load_one(self.items[t[0]], t[1]),
                            zip(idxs, rngs),
                        )
                    )
                    out_q.put(
                        dict(
                            image1=np.stack([r[0] for r in results]),
                            image2=np.stack([r[1] for r in results]),
                            gt=np.stack([r[2] for r in results]),
                        )
                    )
            out_q.put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            yield item


class PairEvalLoader:
    """Sequential pair loader for validation / prediction dumping.

    Yields per-pair records with original-resolution GT (when present) for
    metric computation at native size, mirroring the reference's
    test_dataset / eval_dataset protocols (dataset.py:157-293) minus their
    global-index-cycling statefulness (SURVEY.md §7.10).

    ``use_native`` (or env EMIP_NATIVE_LOADER=1) routes frame decoding
    through the C++ loader (emip_tpu/data/native.py) — threaded decode +
    PIL-compatible resample; within 1/255 of the PIL default path.
    """

    def __init__(
        self,
        images_root: str,
        gts_root: str | None = None,
        size: int = 352,
        dataset_type: str = "MoCA",
        with_gt: bool = True,
        num_workers: int = 8,
        prefetch: int = 8,
        use_native: bool | None = None,
    ):
        import os as _os

        self.items = scan_pairs(
            images_root, gts_root, dataset_type, require_gt=with_gt
        )
        self.size = size
        self.with_gt = with_gt
        self.num_workers = num_workers
        self.prefetch = prefetch
        if use_native is None:
            use_native = _os.environ.get("EMIP_NATIVE_LOADER") == "1"
        if use_native:
            from emip_tpu.data import native

            use_native = native.available()
        self.use_native = bool(use_native)

    def __len__(self):
        return len(self.items)

    def _load_one(self, item: PairItem):
        if self.use_native:
            from emip_tpu.data import native

            orig_hw = native.image_size(item.image1)
            rec = dict(
                image1=native.load_image(item.image1, self.size),
                image2=native.load_image(item.image2, self.size),
                video=item.video,
                frame_name=item.frame_name,
                orig_hw=orig_hw,
            )
            if self.with_gt and item.gt is not None:
                gt = _load_gray(item.gt)
                rec["gt"] = np.asarray(gt, np.float32)
                rec["gt_resized"] = _to_mask_array(gt, self.size)
                rec["orig_hw"] = (gt.height, gt.width)
            return rec
        img1 = _load_rgb(item.image1)
        orig_hw = (img1.height, img1.width)
        rec = dict(
            image1=_to_norm_array(img1, self.size),
            image2=_to_norm_array(_load_rgb(item.image2), self.size),
            video=item.video,
            frame_name=item.frame_name,
            orig_hw=orig_hw,
        )
        if self.with_gt and item.gt is not None:
            gt = _load_gray(item.gt)
            rec["gt"] = np.asarray(gt, np.float32)  # native resolution, 0..255
            rec["gt_resized"] = _to_mask_array(gt, self.size)
            rec["orig_hw"] = (gt.height, gt.width)
        return rec

    def __iter__(self):
        with ThreadPoolExecutor(self.num_workers) as pool:
            yield from pool.map(self._load_one, self.items)


class StaticImageLoader:
    """Flat image/GT directory loader for static-image pretraining.

    COD10K-style layout: ``<root>/Imgs/*.jpg`` (or ``Image/``) +
    ``<root>/GT/*.png`` with matching basenames. Serves the
    segmentation-stream pretrain config (BASELINE.json config #2) that the
    reference implies via ``load.type: COD10K`` but ships no loader for.
    """

    def __init__(self, root: str, batch_size: int, size: int = 352,
                 seed: int = 123, num_workers: int = 8, prefetch: int = 4,
                 augment: bool = True, drop_remainder: bool = True,
                 shard: tuple[int, int] | None = None):
        import os

        img_dir = None
        for cand in ("Imgs", "Image", "Images"):
            if os.path.isdir(os.path.join(root, cand)):
                img_dir = os.path.join(root, cand)
                break
        assert img_dir is not None, f"no image dir under {root}"
        gt_dir = os.path.join(root, "GT")
        imgs = sorted(
            os.path.join(img_dir, f) for f in os.listdir(img_dir)
            if f.lower().endswith((".jpg", ".png"))
        )
        self.items = []
        for img in imgs:
            stem = os.path.splitext(os.path.basename(img))[0]
            gt = os.path.join(gt_dir, stem + ".png")
            if os.path.isfile(gt):
                self.items.append((img, gt))
        self.batch_size = batch_size
        self.size = size
        self.seed = seed
        self.num_workers = num_workers
        self.augment = augment
        # see PairTrainLoader: sharded batched loaders must drop remainders
        assert shard is None or drop_remainder, (
            "shard requires drop_remainder=True (equal per-process batches)"
        )
        self.drop_remainder = drop_remainder
        self.shard = shard
        self.epoch = 0

    def __len__(self):
        n_items = len(self.items)
        if self.shard is not None:
            n_items = len(shard_order(list(range(n_items)), *self.shard))
        n = n_items // self.batch_size
        if not self.drop_remainder and n_items % self.batch_size:
            n += 1
        return n

    def _load_one(self, idx: int, rng: random.Random):
        img_path, gt_path = self.items[idx]
        img = _load_rgb(img_path)
        gt = _load_gray(gt_path)
        if self.augment:
            img, gt = aug.joint_rotation(rng, [img, gt])
            img, gt = aug.joint_hflip(rng, [img, gt])
            img = aug.color_jitter(rng, img)
            gt = aug.salt_pepper(rng, gt)
        return _to_norm_array(img, self.size), _to_mask_array(gt, self.size)

    def __iter__(self):
        self.epoch += 1
        order = list(range(len(self.items)))
        random.Random(f"{self.seed}:{self.epoch}").shuffle(order)
        if self.shard is not None:
            order = shard_order(order, *self.shard)
        batches = [order[i : i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_remainder:
            batches = [b for b in batches if len(b) == self.batch_size]
        with ThreadPoolExecutor(self.num_workers) as pool:
            for bi, idxs in enumerate(batches):
                rngs = [random.Random(f"{self.seed}:{self.epoch}:{bi}:{j}")
                        for j in range(len(idxs))]
                results = list(pool.map(
                    lambda t: self._load_one(t[0], t[1]), zip(idxs, rngs)
                ))
                yield dict(
                    image=np.stack([r[0] for r in results]),
                    gt=np.stack([r[1] for r in results]),
                )


class ClipLoader:
    """Whole-video loader for the long-term model.

    One element per video: frames [T, H, W, 3] (normalized), masks
    [T, h, w, 1] at model resolution, native-resolution GTs, and naming
    info — the clip-level protocol of ``dataset/dataset_long_acc.py`` (no
    augmentation, effective batch 1 per video).
    """

    def __init__(
        self,
        images_root: str,
        gts_root: str | None = None,
        size: int = 352,
        dataset_type: str = "MoCA",
        with_gt: bool = True,
        num_workers: int = 8,
        shuffle: bool = False,
        seed: int = 123,
        use_native: bool | None = None,
        shard: tuple[int, int] | None = None,
    ):
        import os as _os

        self.clips = scan_clips(
            images_root, gts_root, dataset_type, require_gt=with_gt
        )
        self.size = size
        self.with_gt = with_gt
        self.num_workers = num_workers
        self.shuffle = shuffle
        self.seed = seed
        self.shard = shard
        self.epoch = 0
        if use_native is None:
            use_native = _os.environ.get("EMIP_NATIVE_LOADER") == "1"
        if use_native:
            from emip_tpu.data import native

            use_native = native.available()
        self.use_native = bool(use_native)

    def __len__(self):
        if self.shard is not None:
            return len(shard_order(list(range(len(self.clips))),
                                   *self.shard))
        return len(self.clips)

    def load_clip(self, clip: ClipItem):
        if self.use_native:
            from emip_tpu.data import native

            frames_arr = native.load_batch(list(clip.frames), self.size,
                                           num_threads=self.num_workers)
        else:
            with ThreadPoolExecutor(self.num_workers) as pool:
                frames_arr = np.stack(list(
                    pool.map(
                        lambda p: _to_norm_array(_load_rgb(p), self.size),
                        clip.frames,
                    )
                ))
        rec = dict(
            video=clip.video,
            frames=frames_arr,  # [T, S, S, 3]
            frame_names=clip.frame_names,
        )
        if self.with_gt and clip.gts:
            gts = [_load_gray(p) for p in clip.gts]
            rec["masks"] = np.stack(
                [_to_mask_array(g, self.size) for g in gts]
            )
            rec["gts"] = [np.asarray(g, np.float32) for g in gts]
        return rec

    def __iter__(self):
        self.epoch += 1
        order = list(range(len(self.clips)))
        if self.shuffle:
            random.Random(f"{self.seed}:{self.epoch}").shuffle(order)
        if self.shard is not None:
            order = shard_order(order, *self.shard)
        for i in order:
            yield self.load_clip(self.clips[i])
