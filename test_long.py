#!/usr/bin/env python
"""Long-term streaming inference: per-video masks with memory carry.

Equivalent of the reference's ``test_long.py``: frame 0 uses the short-term
prediction (paired with frame 1); frames 1..T-1 use the memory-prompted
long head with the rolling key/value buffer carried across steps.
"""

import argparse
import os

from emip_tpu.infer import predict_clips_long
from emip_tpu.train.long import build_long_state
from emip_tpu.train.state import merge_params
from emip_tpu.utils.checkpoint import restore_checkpoint
from emip_tpu.utils.config import load_config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/emip.yaml")
    parser.add_argument("--ckpt", default=None,
                        help="orbax dir of the trained long model")
    parser.add_argument("--save_path", default="./predictions_long")
    parser.add_argument("--data", nargs="*", default=None,
                        metavar="NAME=PATH")
    args = parser.parse_args()

    cfg = load_config(args.config)
    model, _, state = build_long_state(cfg)
    if args.ckpt:
        state, step = restore_checkpoint(args.ckpt, state)
        print(f">>> restored long checkpoint step {step}")
    variables = dict(
        params=merge_params(state.params, state.frozen),
        batch_stats=state.batch_stats,
    )

    datasets = {}
    if args.data:
        for spec in args.data:
            name, path = spec.split("=", 1)
            datasets[name] = path
    else:
        datasets["MoCA_test"] = cfg.val_dataset.image_path

    for name, root in datasets.items():
        out = os.path.join(args.save_path, name)
        print(f">>> long inference {name} from {root} -> {out}")
        predict_clips_long(
            model, variables, root, out,
            size=cfg.val_dataset.inp_size,
            dataset_type=name if "CAD" in name else cfg.val_dataset.dataset_type,
        )


if __name__ == "__main__":
    main()
