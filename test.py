#!/usr/bin/env python
"""Short-term batch inference: dump per-video PNG masks.

Equivalent of the reference's ``test.py`` (§3.3 of SURVEY.md): runs the
two-stream model over frame pairs of each dataset and writes
``<save_path>/<dataset>/<video>/<frame>.png`` predictions, post-processed
identically (bilinear upsample to native size, sigmoid, min-max, PIL save).
Pairs are batched through one jitted forward.
"""

import argparse
import os

from emip_tpu.infer import predict_pairs
from emip_tpu.train.loops import build_short_state
from emip_tpu.utils.checkpoint import restore_checkpoint
from emip_tpu.utils.config import load_config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/emip.yaml")
    parser.add_argument("--save_path", default="./predictions")
    parser.add_argument("--ckpt", default=None,
                        help="orbax checkpoint dir (e.g. .../ckpt_best); "
                             "torch .pth snapshots load via config load.path")
    parser.add_argument("--data", nargs="*", default=None,
                        metavar="NAME=PATH",
                        help="datasets to evaluate, e.g. "
                             "MoCA_test=/data/MoCA CAD_eval=/data/CAD")
    parser.add_argument("--batch_size", type=int, default=8)
    args = parser.parse_args()

    cfg = load_config(args.config)
    model, _, state = build_short_state(cfg)
    if args.ckpt:
        state, step = restore_checkpoint(args.ckpt, state)
        print(f">>> restored checkpoint step {step} from {args.ckpt}")

    datasets = {}
    if args.data:
        for spec in args.data:
            name, path = spec.split("=", 1)
            datasets[name] = path
    else:
        datasets["MoCA_test"] = cfg.val_dataset.image_path

    for name, root in datasets.items():
        out = os.path.join(args.save_path, name)
        print(f">>> predicting {name} from {root} -> {out}")
        predict_pairs(
            model, state, root, out,
            size=cfg.val_dataset.inp_size,
            dataset_type=name if "CAD" in name else cfg.val_dataset.dataset_type,
            batch_size=args.batch_size,
        )


if __name__ == "__main__":
    main()
