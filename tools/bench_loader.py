#!/usr/bin/env python
"""Data-loader throughput: native C++ batch decoder vs the PIL path.

The reference feeds the GPU from torchvision/PIL workers
(dataset/dataset.py); the rebuild's native loader (data/native/loader.cc)
is a threaded libjpeg/libpng decode + PIL-compatible triangle resample +
ImageNet normalize. This benchmarks both on a synthetic JPEG tree and
reports images/s — run on the host CPU (no TPU needed).

Usage: python tools/bench_loader.py [--n 256] [--size 352] [--threads 8]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_tree(root: str, n: int) -> list:
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 256, (480, 640, 3), np.uint8)
        p = os.path.join(root, f"{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def bench_pil(paths, size):
    from emip_tpu.data.pipeline import _load_rgb, _to_norm_array

    t0 = time.perf_counter()
    for p in paths:
        _to_norm_array(_load_rgb(p), size)
    return len(paths) / (time.perf_counter() - t0)


def bench_native(paths, size, threads):
    from emip_tpu.data import native

    if not native.available():
        return None
    native.load_batch(paths[:8], size)  # warm the thread pool
    t0 = time.perf_counter()
    native.load_batch(paths, size, num_threads=threads)
    return len(paths) / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--size", type=int, default=352)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        paths = make_tree(root, args.n)
        pil = bench_pil(paths, args.size)
        nat = bench_native(paths, args.size, args.threads)
        print(f"PIL single-thread:      {pil:8.1f} images/s")
        if nat is None:
            print("native loader unavailable (build failed?)")
        else:
            print(f"native ({args.threads} threads):     {nat:8.1f} images/s"
                  f"  ({nat / pil:.1f}x)")


if __name__ == "__main__":
    main()
