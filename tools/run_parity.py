#!/usr/bin/env python
"""One-command accuracy-parity runbook: checkpoint -> predictions -> table.

Collapses the checkpoint-readiness drill into a single command that produces
the BASELINE.md comparison the moment real assets exist:

    python tools/run_parity.py --ckpt Net_epoch_best.pth \
        --flow-ckpt gmflow_things-e9887eda.pth \
        --data-root /data/VCOD --datasets MoCA_test CAD_eval

``--long-ckpt`` additionally evaluates the long-term (LTM) variant via
``test_long.py`` (reference EMIP-dagger row). ``--drill`` runs the whole
chain with synthetic reference-format snapshots (random weights, DDP
``module.`` prefixes) and synthetic data — proving the pipeline end to end
without assets; the reference's published numbers obviously won't be hit.

Data layout (reference conventions, dataset/dataset.py:24-42):
    <data_root>/<dataset>/<sequence>/{Imgs|frames|Frame}/*.jpg
    <data_root>/<dataset>/<sequence>/GT/*.png

Outputs under --out: the per-dataset prediction PNGs, the metric tables,
and ``parity_report.json`` with measured-vs-published deltas
(targets: /root/reference/imgs/sota.jpg Table I, transcribed in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# BASELINE.md published targets (reference imgs/sota.jpg, Table I)
TARGETS = {
    "short": {
        "MoCA_test": {"Smeasure": 0.669, "wFmeasure": 0.374, "MAE": 0.017,
                      "meanDice": 0.424, "meanIoU": 0.326},
        "CAD_eval": {"Smeasure": 0.710, "wFmeasure": 0.504, "MAE": 0.029,
                     "meanDice": 0.528, "meanIoU": 0.415},
    },
    "long": {
        "MoCA_test": {"Smeasure": 0.675, "wFmeasure": 0.381, "MAE": 0.015,
                      "meanDice": 0.426, "meanIoU": 0.333},
        "CAD_eval": {"Smeasure": 0.719, "wFmeasure": 0.514, "MAE": 0.028,
                     "meanDice": 0.536, "meanIoU": 0.425},
    },
}
# MAE is better lower; everything else better higher
LOWER_BETTER = {"MAE"}


def write_config(path, ckpt, flow_ckpt, long_ckpt=None, dtype="float32"):
    with open(path, "w") as f:
        f.write(f"""\
load:
  path: {ckpt}
  flow_path: {flow_ckpt}
{f'  long_path: {long_ckpt}\n' if long_ckpt else ''}\
  type: EMIP
model:
  name: EMIP
  args:
    inp_size: 352
    channel: 32
    backbone_name: pvt_v2_b5
    in_channel_list: [128, 320, 512]
    include_dead_modules: true
    GMFlow:
      feature_channels: 128
      num_transformer_layers: 6
      attn_splits_list: [2]
      corr_radius_list: [-1]
      prop_radius_list: [-1]
      pred_bidir_flow: true
compute_dtype: {dtype}
""")


def drill_assets(work, with_long=False):
    """Synthetic reference-format snapshots + synthetic video data."""
    import torch

    from emip_tpu.data.synthetic import make_synthetic_video_root
    from tests.ref_oracle import import_reference, reference_model_args

    data_root = work
    ds_root = os.path.join(data_root, "MoCA_test")
    if not os.path.isdir(ds_root):
        make_synthetic_video_root(ds_root, num_videos=1,
                                  frames_per_video=4, size=(96, 128))

    snap = os.path.join(work, "Net_epoch_best.pth")
    gm = os.path.join(work, "gmflow_things.pth")
    if not os.path.isfile(snap):
        model_mod = import_reference("model.EMIP_short.model")
        import_reference("lib.pvt_v2")
        torch.manual_seed(0)
        print(">>> constructing reference CoUpdater (full b5)...", flush=True)
        co = model_mod.CoUpdater(reference_model_args())
        sd = {f"module.{k}": v for k, v in co.state_dict().items()}
        torch.save(sd, snap)
        gm_sd = {k[len("GMFlow."):]: v for k, v in co.state_dict().items()
                 if k.startswith("GMFlow.")}
        torch.save({"model": gm_sd}, gm)
        print(f">>> wrote {snap} + {gm}")

    long_snap = None
    if with_long:
        long_snap = os.path.join(work, "Net_long_best.pth")
        if not os.path.isfile(long_snap):
            long_mod = import_reference("model.EMIP_long.model_long")
            # Model_long constructs CoUpdater AFTER import_reference pops
            # the reference path; pre-register its lazy `lib` import (the
            # short branch does the same — without this the long-only
            # drill fails when the short snapshot is already cached).
            import_reference("lib.pvt_v2")
            torch.manual_seed(1)
            print(">>> constructing reference Model_long (full b5)...",
                  flush=True)
            ml = long_mod.Model_long(reference_model_args())
            torch.save({f"module.{k}": v for k, v in ml.state_dict().items()},
                       long_snap)
            print(f">>> wrote {long_snap}")
    return snap, gm, long_snap, data_root


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", help="reference-format short-model .pth")
    ap.add_argument("--flow-ckpt", help="upstream gmflow_things .pth")
    ap.add_argument("--long-ckpt", default=None,
                    help="optional long-model .pth (evaluates EMIP-dagger)")
    ap.add_argument("--data-root", help="root with <dataset>/<seq>/{Imgs,GT}")
    ap.add_argument("--datasets", nargs="+",
                    default=["MoCA_test", "CAD_eval"])
    ap.add_argument("--out", default="./parity_run")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--drill", action="store_true",
                    help="synthetic assets end-to-end pipeline proof")
    ap.add_argument("--with-long", action="store_true",
                    help="with --drill: also synthesize + drive the "
                         "long-model leg (roughly doubles drill runtime)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.drill:
        args.ckpt, args.flow_ckpt, long_snap, args.data_root = drill_assets(
            args.out, with_long=args.with_long)
        if long_snap:
            args.long_ckpt = long_snap
        args.datasets = ["MoCA_test"]
        args.batch_size = 1
    if not (args.ckpt and args.flow_ckpt and args.data_root):
        ap.error("--ckpt, --flow-ckpt and --data-root are required "
                 "(or use --drill)")

    datasets = [d for d in args.datasets
                if os.path.isdir(os.path.join(args.data_root, d))]
    missing = sorted(set(args.datasets) - set(datasets))
    if missing:
        print(f"# skipping missing datasets: {missing}")
    if not datasets:
        sys.exit(f"no dataset directories found under {args.data_root}")

    cfg_path = os.path.join(args.out, "parity.yaml")
    write_config(cfg_path, args.ckpt, args.flow_ckpt, args.long_ckpt)

    report = {}
    variants = [("short", "test.py", os.path.join(args.out, "preds_short"))]
    if args.long_ckpt:
        variants.append(
            ("long", "test_long.py", os.path.join(args.out, "preds_long")))

    for variant, entry, preds in variants:
        data_args = [f"{d}={os.path.join(args.data_root, d)}/"
                     for d in datasets]
        cmd = [sys.executable, entry, "--config", cfg_path,
               "--data", *data_args, "--save_path", preds]
        if variant == "short":
            cmd += ["--batch_size", str(args.batch_size)]
        # the long variant loads its torch snapshot via the config's
        # load.long_path (build_long_state -> convert_emip_long_state);
        # test_long.py's --ckpt is for orbax dirs of OUR trained runs
        print(">>>", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=REPO)

        from emip_tpu.eval_offline import (
            DEFAULT_METRICS,
            evaluate_dataset,
            format_table,
        )

        rows = []
        report[variant] = {}
        for name in datasets:
            scores = evaluate_dataset(
                gt_root=os.path.join(args.data_root, name),
                pred_root=os.path.join(preds, name),
                dataset_name=name,
                metrics=DEFAULT_METRICS,
            )
            rows.append(tuple(
                [name, f"EMIP-TPU-{variant}"]
                + [f"{scores[m]:.3f}" for m in DEFAULT_METRICS]))
            tgt = TARGETS[variant].get(name, {})
            report[variant][name] = {
                m: {
                    "measured": round(float(scores[m]), 4),
                    **({"published": tgt[m],
                        "delta": round(
                            (tgt[m] - float(scores[m]))
                            if m in LOWER_BETTER
                            else (float(scores[m]) - tgt[m]), 4)}
                       if m in tgt else {}),
                }
                for m in DEFAULT_METRICS
            }
        table = format_table(rows, DEFAULT_METRICS)
        print(table)
        with open(os.path.join(args.out, f"{variant}_eval.txt"), "w") as f:
            f.write(table + "\n")

    with open(os.path.join(args.out, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f">>> parity report: {os.path.join(args.out, 'parity_report.json')}")
    if args.drill:
        print(">>> DRILL OK: reference-format .pth -> predictions -> table")

    # quick verdict print for real runs ('delta' >= 0 means >= published)
    for variant, ds in report.items():
        for name, ms in ds.items():
            deltas = {m: v["delta"] for m, v in ms.items() if "delta" in v}
            if deltas:
                ok = sum(d >= -0.005 for d in deltas.values())
                print(f"# {variant}/{name}: {ok}/{len(deltas)} metrics "
                      f"within 0.005 of published; deltas {deltas}")


if __name__ == "__main__":
    main()
