"""Metric parity tests.

Primary check: bit-level agreement with the reference implementation
(``/root/reference/eval/metrics.py``) executed as an external oracle when
present (skipped otherwise). Plus self-consistency sanity checks that always
run.
"""

import os
import sys

import numpy as np
import pytest

from emip_tpu.metrics import (
    MAE,
    Dice,
    Emeasure,
    Fmeasure,
    IoU,
    Smeasure,
    WeightedFmeasure,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "eval"))

RNG = np.random.default_rng(11)


def _cases():
    cases = []
    for _ in range(4):
        h, w = RNG.integers(40, 90), RNG.integers(40, 90)
        pred = RNG.uniform(0, 255, size=(h, w)).astype(np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        cy, cx, r = RNG.integers(10, h - 10), RNG.integers(10, w - 10), 8
        gt = (((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r).astype(np.uint8) * 255
        cases.append((pred, gt.astype(np.float32)))
    # edge case: empty GT
    cases.append((RNG.uniform(0, 255, (50, 60)).astype(np.float32),
                  np.zeros((50, 60), np.float32)))
    return cases


@pytest.mark.skipif(not HAS_REF, reason="reference tree not mounted")
def test_metrics_match_reference_oracle():
    sys.path.insert(0, REF)
    try:
        import eval.metrics as ref_metrics
    finally:
        sys.path.pop(0)

    ours = dict(sm=Smeasure(), wfm=WeightedFmeasure(), mae=MAE(),
                em=Emeasure(), fm=Fmeasure())
    refs = dict(sm=ref_metrics.Smeasure(), wfm=ref_metrics.WeightedFmeasure(),
                mae=ref_metrics.MAE(), em=ref_metrics.Emeasure(),
                fm=ref_metrics.Fmeasure())

    for pred, gt in _cases():
        for m in ours.values():
            m.step(pred, gt)
        for m in refs.values():
            m.step(pred, gt)

    np.testing.assert_allclose(
        ours["sm"].get_results()["sm"], refs["sm"].get_results()["sm"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        ours["wfm"].get_results()["wfm"], refs["wfm"].get_results()["wfm"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        ours["mae"].get_results()["mae"], refs["mae"].get_results()["mae"],
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        ours["em"].get_results()["em"]["adp"],
        refs["em"].get_results()["em"]["adp"], rtol=1e-6,
    )
    np.testing.assert_allclose(
        ours["em"].get_results()["em"]["curve"],
        refs["em"].get_results()["em"]["curve"], rtol=1e-6,
    )
    np.testing.assert_allclose(
        ours["fm"].get_results()["fm"]["adp"],
        refs["fm"].get_results()["fm"]["adp"], rtol=1e-6,
    )
    np.testing.assert_allclose(
        ours["fm"].get_results()["fm"]["curve"],
        refs["fm"].get_results()["fm"]["curve"], rtol=1e-6,
    )


@pytest.mark.skipif(not HAS_REF, reason="reference tree not mounted")
def test_dice_iou_match_reference_oracle():
    sys.path.insert(0, REF)
    try:
        import eval.metrics as ref_metrics
    finally:
        sys.path.pop(0)
    d_ours, d_ref = Dice(), ref_metrics.DICE()
    i_ours, i_ref = IoU(), ref_metrics.IoU()
    for pred, gt in _cases()[:4]:
        p = pred / 255.0
        g = (gt > 128).astype(np.float64)
        d_ours.step(p, g)
        d_ref.step(p, g)
        i_ours.step(p, g)
        i_ref.step(p, g)
    np.testing.assert_allclose(d_ours.get_results(), d_ref.get_results(),
                               rtol=1e-6)
    np.testing.assert_allclose(i_ours.get_results(), i_ref.get_results(),
                               rtol=1e-6)


def test_perfect_prediction_scores():
    gt = np.zeros((64, 64), np.float32)
    gt[20:40, 20:40] = 255
    pred = gt.copy()
    sm, wfm, mae = Smeasure(), WeightedFmeasure(), MAE()
    for m in (sm, wfm, mae):
        m.step(pred, gt)
    assert sm.get_results()["sm"] > 0.95
    assert wfm.get_results()["wfm"] > 0.95
    assert mae.get_results()["mae"] < 1e-6


def test_inverted_prediction_scores_poorly():
    gt = np.zeros((64, 64), np.float32)
    gt[20:40, 20:40] = 255
    pred = 255 - gt
    sm = Smeasure()
    sm.step(pred, gt)
    assert sm.get_results()["sm"] < 0.5
