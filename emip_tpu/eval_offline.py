"""Offline VCOD evaluation harness: saved PNGs vs GT, canonical protocol.

Equivalent of the reference's ``eval/eval_vcod`` pipeline
(``moca_evaluator.py:62-157``): per-sequence metric means, then
cross-sequence mean (or max over the 256-threshold curve for max* metrics),
with the standard frame-exclusion rules — MoCA-style datasets drop the last
two GT frames, CAD keeps all frames, VPS drops first+last
(moca_evaluator.py:95-115). Predictions are resized to GT resolution before
scoring (moca_evaluator.py:49-51).
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from emip_tpu.metrics import (
    MAE,
    Emeasure,
    Fmeasure,
    Medical,
    Smeasure,
    WeightedFmeasure,
)
from emip_tpu.ops.image import resize_bilinear_np

__all__ = ["evaluate_sequence", "evaluate_dataset", "format_table"]

_METRIC_MODULES = {
    "Smeasure": Smeasure,
    "wFmeasure": WeightedFmeasure,
    "MAE": MAE,
    "adpEm": Emeasure,
    "meanEm": Emeasure,
    "maxEm": Emeasure,
    "adpFm": Fmeasure,
    "meanFm": Fmeasure,
    "maxFm": Fmeasure,
    "meanSen": Medical,
    "maxSen": Medical,
    "meanSpe": Medical,
    "maxSpe": Medical,
    "meanDice": Medical,
    "maxDice": Medical,
    "meanIoU": Medical,
    "maxIoU": Medical,
}

DEFAULT_METRICS = ("Smeasure", "wFmeasure", "meanEm", "MAE", "meanDice",
                   "meanIoU")


def _read_gray(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float64)


def _metric_value(name: str, results: dict) -> np.ndarray | float:
    """Extract the metric named by the harness convention from a module's
    results (scalar, or a 256-threshold curve for mean*/max* variants)."""
    if name == "Smeasure":
        return results["sm"]
    if name == "wFmeasure":
        return results["wfm"]
    if name == "MAE":
        return results["mae"]
    if name.endswith("Em"):
        return results["em"]["adp"] if name == "adpEm" else results["em"]["curve"]
    if name.endswith("Fm"):
        return results["fm"]["adp"] if name == "adpFm" else results["fm"]["curve"]
    # Medical curves: meanSen/maxSen -> 'sen' etc.; mean-vs-max is applied
    # after cross-sequence averaging in evaluate_dataset
    return results[name.removeprefix("mean").removeprefix("max").lower()]


def frame_exclusion(gt_list: list[str], dataset_name: str) -> list[str]:
    if "VPS" in dataset_name:
        return gt_list[1:-1]
    if "CAD" in dataset_name:
        return gt_list
    return gt_list[:-2]


def _sort_key(path: str):
    stem = os.path.basename(path).rsplit(".", 1)[0]
    tail = stem.split("_")[-1]
    return (0, int(tail)) if tail.isdigit() else (1, stem)


def evaluate_sequence(
    gt_paths: list[str],
    pred_paths: list[str],
    metrics=DEFAULT_METRICS,
) -> dict:
    """Per-sequence metric results (scalars and 256-threshold curves)."""
    modules = {}
    for m in metrics:
        cls = _METRIC_MODULES[m]
        modules.setdefault(cls.__name__, cls())

    assert len(gt_paths) == len(pred_paths)
    for gt_path, pred_path in zip(gt_paths, pred_paths):
        gt = _read_gray(gt_path)
        pred = _read_gray(pred_path)
        if pred.shape != gt.shape:
            pred = resize_bilinear_np(pred, gt.shape, align_corners=False)
        for mod in modules.values():
            mod.step(pred, gt)

    results = {n: mod.get_results() for n, mod in modules.items()}
    return {
        m: _metric_value(m, results[_METRIC_MODULES[m].__name__])
        for m in metrics
    }


def evaluate_dataset(
    gt_root: str,
    pred_root: str,
    dataset_name: str,
    metrics=DEFAULT_METRICS,
    verbose: bool = True,
) -> dict[str, float]:
    """Sequence-mean then cross-sequence aggregation for one dataset."""
    sequences = sorted(
        d for d in os.listdir(gt_root)
        if os.path.isdir(os.path.join(gt_root, d))
    )
    per_seq: list[dict] = []
    for seq in sequences:
        gt_list = sorted(
            glob.glob(os.path.join(gt_root, seq, "GT", "*.png")),
            key=_sort_key,
        )
        gt_list = frame_exclusion(gt_list, dataset_name)
        if not gt_list:
            continue
        pred_list = [
            os.path.join(pred_root, seq, os.path.basename(g)) for g in gt_list
        ]
        missing = [p for p in pred_list if not os.path.isfile(p)]
        if missing:
            raise FileNotFoundError(
                f"{seq}: {len(missing)} missing predictions, e.g. {missing[0]}"
            )
        per_seq.append(evaluate_sequence(gt_list, pred_list, metrics))
        if verbose:
            print(f"  sequence {seq}: done ({len(gt_list)} frames)")

    out: dict[str, float] = {}
    for m in metrics:
        curves = np.asarray([np.asarray(s[m], np.float64) for s in per_seq])
        seq_mean = curves.mean(axis=0)  # mean across sequences
        if m.startswith("max"):
            out[m] = float(np.max(seq_mean))
        else:
            out[m] = float(np.mean(seq_mean))
    return out


def format_table(rows: list[tuple], metrics=DEFAULT_METRICS) -> str:
    """PrettyTable when available; aligned plain text otherwise."""
    header = ["Dataset", "Method"] + list(metrics)
    try:
        import prettytable as pt

        tb = pt.PrettyTable()
        tb.field_names = header
        for row in rows:
            tb.add_row(list(row))
        return str(tb)
    except ImportError:
        lines = ["\t".join(header)]
        for row in rows:
            lines.append("\t".join(str(c) for c in row))
        return "\n".join(lines)
