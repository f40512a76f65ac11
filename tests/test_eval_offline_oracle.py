"""Offline evaluator oracle parity: reference moca_evaluator vs eval_offline.

Builds a synthetic GT/prediction PNG tree and runs BOTH the reference's
``eval/eval_vcod/moca_evaluator.py`` engine (with its own metrics module)
and our ``emip_tpu.eval_offline.evaluate_dataset`` on it, asserting
identical tables to the reference's 3-decimal print precision. Covers the
sequence-mean -> cross-sequence mean/max aggregation (moca_evaluator.py:
122-150), the MoCA last-2-frame exclusion vs CAD keep-all protocol
(:101-115), and scalar/curve metric handling including the Medical curves.
"""

import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

from tests.ref_oracle import REF, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference not mounted"
)

EVAL_DIR = os.path.join(REF, "eval", "eval_vcod")
METRICS = ["Smeasure", "wFmeasure", "meanEm", "maxEm", "adpEm", "MAE",
           "meanDice", "maxDice", "meanIoU", "meanSen", "meanSpe"]


def _make_tree(root, data_name, n_videos=2, n_frames=6, size=(40, 56)):
    """gt tree <root>/gt/<data>/<case>/GT/*.png and matching preds."""
    rng = np.random.default_rng(42)
    gt_root = os.path.join(root, "gt", data_name)
    pred_root = os.path.join(root, "pred", "SAM", "EMIP", data_name)
    h, w = size
    for v in range(n_videos):
        case = f"video_{v}"
        os.makedirs(os.path.join(gt_root, case, "GT"), exist_ok=True)
        os.makedirs(os.path.join(pred_root, case), exist_ok=True)
        for f in range(n_frames):
            # blob-ish GT: random rectangle, binary
            gt = np.zeros((h, w), np.uint8)
            y0, x0 = rng.integers(0, h // 2), rng.integers(0, w // 2)
            gt[y0:y0 + h // 3, x0:x0 + w // 3] = 255
            # pred: noisy version of GT in [0, 255]
            pred = np.clip(
                gt.astype(np.float32) * rng.uniform(0.5, 1.0)
                + rng.normal(0, 40, (h, w)),
                0, 255,
            ).astype(np.uint8)
            name = f"{f:05d}.png"
            Image.fromarray(gt).save(os.path.join(gt_root, case, "GT", name))
            Image.fromarray(pred).save(os.path.join(pred_root, case, name))
    return os.path.join(root, "gt"), os.path.join(root, "pred")


def _run_reference(gt_root, pred_root, data_name, out_dir):
    """Drive the reference eval engine; capture its PrettyTable row."""
    rows = []

    class _FakeTable:
        def __init__(self):
            self.field_names = None

        def add_row(self, row):
            rows.append(row)

        def __str__(self):
            return "\n".join(map(str, rows))

    pt_stub = types.ModuleType("prettytable")
    pt_stub.PrettyTable = _FakeTable

    saved_pt = sys.modules.get("prettytable")
    saved_metrics = sys.modules.pop("metrics", None)
    sys.modules["prettytable"] = pt_stub
    sys.path.insert(0, EVAL_DIR)
    try:
        import importlib

        if "moca_evaluator" in sys.modules:
            del sys.modules["moca_evaluator"]
        moca = importlib.import_module("moca_evaluator")

        opt = types.SimpleNamespace(
            data_lst=[[data_name]],
            metric_list=METRICS,
            model_lst=["EMIP"],
            gt_root=gt_root,
            pred_root=pred_root,
            model_typename="SAM",
        )
        moca.eval_engine_moca(opt, out_dir)
    finally:
        sys.path.pop(0)
        sys.modules.pop("metrics", None)
        sys.modules.pop("moca_evaluator", None)
        if saved_metrics is not None:
            sys.modules["metrics"] = saved_metrics
        if saved_pt is not None:
            sys.modules["prettytable"] = saved_pt
        else:
            sys.modules.pop("prettytable", None)

    (row,) = rows
    # row = [data_name, model_name, *'%.3f' % value]
    return dict(zip(METRICS, map(float, row[2:])))


@pytest.mark.parametrize("data_name", ["MoCA_test", "CAD_eval"])
def test_offline_evaluator_matches_reference(tmp_path, data_name):
    from emip_tpu.eval_offline import evaluate_dataset

    gt_root, pred_root = _make_tree(str(tmp_path), data_name)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)

    want = _run_reference(gt_root, pred_root, data_name, out_dir)
    got = evaluate_dataset(
        os.path.join(gt_root, data_name),
        os.path.join(pred_root, "SAM", "EMIP", data_name),
        data_name,
        metrics=METRICS,
        verbose=False,
    )

    for m in METRICS:
        assert abs(got[m] - want[m]) < 5.1e-4, (m, got[m], want[m])
