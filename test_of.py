#!/usr/bin/env python
"""Optical-flow visualization: dump predicted flow as color-wheel images.

Equivalent of the reference's ``test_of.py``: runs the short-term model and
renders the forward flow of each pair with the Middlebury color wheel.
"""

import argparse
import os

import numpy as np
from PIL import Image

from emip_tpu.infer import predict_pairs
from emip_tpu.train.loops import build_short_state
from emip_tpu.utils.checkpoint import restore_checkpoint
from emip_tpu.utils.config import load_config
from emip_tpu.utils.flow_viz import flow_to_image


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/emip.yaml")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--save_path", default="./flow_viz")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--dataset_type", default="MoCA")
    args = parser.parse_args()

    cfg = load_config(args.config)
    model, _, state = build_short_state(cfg)
    if args.ckpt:
        state, _ = restore_checkpoint(args.ckpt, state)

    root = args.data_root or cfg.val_dataset.image_path
    flows = predict_pairs(
        model, state, root, os.path.join(args.save_path, "_masks"),
        size=cfg.val_dataset.inp_size, dataset_type=args.dataset_type,
        return_flow=True,
    )
    for video, name, flow in flows:
        img = flow_to_image(np.asarray(flow))
        out_dir = os.path.join(args.save_path, video)
        os.makedirs(out_dir, exist_ok=True)
        Image.fromarray(img).save(os.path.join(out_dir, name + ".jpg"))
        print(f">>> flow viz saved: {video}/{name}.jpg")


if __name__ == "__main__":
    main()
