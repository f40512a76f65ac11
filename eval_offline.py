#!/usr/bin/env python
"""Offline evaluator CLI: score saved prediction PNGs against GT.

Equivalent of the reference's ``eval/eval_vcod/run_eval.sh`` ->
``moca_evaluator.py`` pipeline; writes a table per dataset to
``<out>/<dataset>_eval.txt``.
"""

import argparse
import os

from emip_tpu.eval_offline import DEFAULT_METRICS, evaluate_dataset, format_table


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gt_root", required=True,
                        help="root containing <dataset>/<sequence>/GT/*.png")
    parser.add_argument("--pred_root", required=True,
                        help="root containing <dataset>/<sequence>/*.png")
    parser.add_argument("--data", nargs="+", required=True,
                        help="dataset names, e.g. MoCA_test CAD_eval")
    parser.add_argument("--method", default="EMIP-TPU")
    parser.add_argument("--metrics", nargs="+", default=list(DEFAULT_METRICS))
    parser.add_argument("--out", default="./eval_results")
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for name in args.data:
        print("#" * 20, "Dataset:", name, "#" * 20)
        scores = evaluate_dataset(
            gt_root=os.path.join(args.gt_root, name),
            pred_root=os.path.join(args.pred_root, name),
            dataset_name=name,
            metrics=tuple(args.metrics),
        )
        row = [name, args.method] + [f"{scores[m]:.3f}" for m in args.metrics]
        table = format_table([tuple(row)], tuple(args.metrics))
        print(table)
        with open(os.path.join(args.out, f"{name}_eval.txt"), "a+") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
