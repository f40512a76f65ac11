#!/usr/bin/env python
"""Short-term two-stream training entry point.

Equivalent of the reference's ``train.py`` (argparse + YAML; SURVEY.md §3.1)
on the TPU-native stack: data-parallel mesh, jitted train step, in-loop
validation, best-by-MAE checkpointing with optimizer-state resume.
"""

import argparse

from emip_tpu.parallel.mesh import init_distributed
from emip_tpu.train.loops import train_short
from emip_tpu.utils.config import load_config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/emip.yaml")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint (incl. "
                             "optimizer state)")
    parser.add_argument("--save_path", default=None,
                        help="override config save_path")
    parser.add_argument("--max_steps_per_epoch", type=int, default=None,
                        help="debug: cap steps per epoch")
    parser.add_argument("--multi_host", action="store_true",
                        help="initialize jax.distributed for multi-host DCN")
    args = parser.parse_args()

    if args.multi_host:
        init_distributed()

    cfg = load_config(args.config)
    if args.save_path:
        cfg.save_path = args.save_path

    _, summary = train_short(cfg, resume=args.resume,
                             max_steps_per_epoch=args.max_steps_per_epoch)
    print(f">>> training done: {summary}")


if __name__ == "__main__":
    main()
