#!/usr/bin/env python
"""Long-term (space-time-memory) training entry point.

Equivalent of the reference's ``train_long.py`` (§3.4 of SURVEY.md): loads a
trained short-term checkpoint under the frozen ``short_term`` subtree and
trains the LTM + long decoder heads frame-by-frame over whole videos with a
rolling, detached memory.
"""

import argparse

from emip_tpu.train.long import train_long
from emip_tpu.train.loops import build_short_state
from emip_tpu.train.state import merge_params
from emip_tpu.utils.checkpoint import restore_checkpoint
from emip_tpu.utils.config import load_config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/emip.yaml")
    parser.add_argument("--short_ckpt", default=None,
                        help="orbax dir of the trained short-term model "
                             "(torch .pth loads via config load.path)")
    parser.add_argument("--save_path", default=None)
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.save_path:
        cfg.save_path = args.save_path

    short_variables = None
    if args.short_ckpt or cfg.load.path:
        model, _, state = build_short_state(cfg)
        if args.short_ckpt:
            state, step = restore_checkpoint(args.short_ckpt, state)
            print(f">>> loaded short-term checkpoint step {step}")
        short_variables = dict(
            params=merge_params(state.params, state.frozen),
            batch_stats=state.batch_stats,
        )

    _, summary = train_long(cfg, short_variables)
    print(f">>> long training done: {summary}")


if __name__ == "__main__":
    main()
