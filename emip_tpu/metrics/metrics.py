"""Streaming segmentation metrics (numpy, offline/host-side).

Functional re-implementations of the canonical SOC/VCOD metric suite used by
the reference for in-training validation and offline evaluation
(``eval/metrics.py``): S-measure, weighted F-measure, MAE, E-measure,
F-measure (adaptive + 256-threshold curves), Dice and IoU. The math follows
the published metric definitions (Fan et al. S/E-measure, Margolin wFm);
each metric is a pure function over one (pred, gt) frame plus a thin
streaming accumulator with the ``step`` / ``get_results`` protocol.

Conventions (identical to the reference, SURVEY.md §7.9):
  * gt is binarized at >128 (uint8 scale);
  * pred is scaled to [0,1] then min-max normalized per frame;
  * metrics run on host CPU in float64 — they are offline, not jitted.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import convolve
from scipy.ndimage import distance_transform_edt

_EPS = np.spacing(1)

__all__ = [
    "prepare_pred_gt",
    "Smeasure",
    "WeightedFmeasure",
    "MAE",
    "Emeasure",
    "Fmeasure",
    "Dice",
    "IoU",
]


def prepare_pred_gt(pred: np.ndarray, gt: np.ndarray):
    """gt > 128 binarization; pred -> [0,1] + per-frame min-max normalize."""
    gt = gt > 128
    pred = pred / 255.0
    pmin, pmax = pred.min(), pred.max()
    if pmax != pmin:
        pred = (pred - pmin) / (pmax - pmin)
    return pred, gt


class _Streaming:
    """Accumulate per-frame scores; mean on get_results."""

    def __init__(self):
        self._scores = []

    def _push(self, value):
        self._scores.append(value)

    def _mean(self):
        return np.mean(np.asarray(self._scores, np.float64), axis=0)


# ---------------------------------------------------------------- S-measure


def _ssim_region(pred: np.ndarray, gt: np.ndarray) -> float:
    """Structural similarity of one region (scalar form used by S-measure)."""
    n = pred.size
    x, y = pred.mean(), gt.mean()
    sig_x = ((pred - x) ** 2).sum() / (n - 1)
    sig_y = ((gt - y) ** 2).sum() / (n - 1)
    sig_xy = ((pred - x) * (gt - y)).sum() / (n - 1)
    alpha = 4 * x * y * sig_xy
    beta = (x**2 + y**2) * (sig_x + sig_y)
    if alpha != 0:
        return alpha / (beta + _EPS)
    return 1.0 if beta == 0 else 0.0


def _s_object_term(pred: np.ndarray, region: np.ndarray) -> float:
    vals = pred[region]
    if vals.size == 0:
        return 0.0
    x = vals.mean()
    sigma = vals.std(ddof=1) if vals.size > 1 else 0.0
    return 2 * x / (x**2 + 1 + sigma + _EPS)


def s_measure(pred: np.ndarray, gt: np.ndarray, alpha: float = 0.5) -> float:
    """Structure measure (object + region terms, centroid quad split)."""
    y = gt.mean()
    if y == 0:
        return 1 - pred.mean()
    if y == 1:
        return pred.mean()

    # object-aware term
    u = gt.mean()
    s_obj = u * _s_object_term(pred, gt) + (1 - u) * _s_object_term(
        1 - pred, ~gt
    )

    # region-aware term: split at the GT centroid (+1 offset, reference rule)
    h, w = gt.shape
    total = gt.sum()
    if total == 0:
        cx, cy = round(w / 2) + 1, round(h / 2) + 1
    else:
        cols = (gt.sum(axis=0) * np.arange(w)).sum() / total
        rows = (gt.sum(axis=1) * np.arange(h)).sum() / total
        cx, cy = int(round(cols)) + 1, int(round(rows)) + 1

    score = 0.0
    area = h * w
    quads = [
        (slice(0, cy), slice(0, cx)),
        (slice(0, cy), slice(cx, w)),
        (slice(cy, h), slice(0, cx)),
        (slice(cy, h), slice(cx, w)),
    ]
    weights = [
        cx * cy / area,
        cy * (w - cx) / area,
        (h - cy) * cx / area,
    ]
    weights.append(1 - sum(weights))
    for (sl, wgt) in zip(quads, weights):
        score += wgt * _ssim_region(pred[sl], gt[sl].astype(np.float64))

    return max(0.0, alpha * s_obj + (1 - alpha) * score)


class Smeasure(_Streaming):
    def __init__(self, alpha: float = 0.5):
        super().__init__()
        self.alpha = alpha

    def step(self, pred: np.ndarray, gt: np.ndarray):
        pred, gt = prepare_pred_gt(pred, gt)
        self._push(s_measure(pred, gt, self.alpha))

    def get_results(self):
        return dict(sm=self._mean())


# ------------------------------------------------------ weighted F-measure


def _gauss_kernel_7x7(sigma: float = 5.0) -> np.ndarray:
    ax = np.arange(-3, 4, dtype=np.float64)
    g1 = np.exp(-(ax**2) / (2 * sigma * sigma))
    k = np.outer(g1, g1)
    k[k < np.finfo(k.dtype).eps * k.max()] = 0
    return k / k.sum()


def weighted_fmeasure(pred: np.ndarray, gt: np.ndarray,
                      beta: float = 1.0) -> float:
    """Margolin et al. 'How to Evaluate Foreground Maps' weighted Fb."""
    if not gt.any():
        return 0.0
    dist, idx = distance_transform_edt(~gt, return_indices=True)

    err = np.abs(pred - gt)
    err_t = err.copy()
    bg = ~gt
    err_t[bg] = err[idx[0][bg], idx[1][bg]]

    smoothed = convolve(err_t, _gauss_kernel_7x7(), mode="constant", cval=0)
    err_min = np.where(gt & (smoothed < err), smoothed, err)

    importance = np.where(bg, 2 - np.exp(np.log(0.5) / 5 * dist), 1.0)
    ew = err_min * importance

    tpw = gt.sum() - ew[gt].sum()
    fpw = ew[bg].sum()
    recall = 1 - ew[gt].mean()
    precision = tpw / (tpw + fpw + _EPS)
    return (1 + beta) * recall * precision / (recall + beta * precision + _EPS)


class WeightedFmeasure(_Streaming):
    def __init__(self, beta: float = 1.0):
        super().__init__()
        self.beta = beta

    def step(self, pred: np.ndarray, gt: np.ndarray):
        pred, gt = prepare_pred_gt(pred, gt)
        self._push(weighted_fmeasure(pred, gt, self.beta))

    def get_results(self):
        return dict(wfm=self._mean())


# ----------------------------------------------------------------- MAE


class MAE(_Streaming):
    def step(self, pred: np.ndarray, gt: np.ndarray):
        pred, gt = prepare_pred_gt(pred, gt)
        self._push(np.abs(pred - gt).mean())

    def get_results(self):
        return dict(mae=self._mean())


# ------------------------------------------------------------- E-measure


def _em_from_counts(fg_fg, fg_bg, gt_fg_count, gt_size):
    """Enhanced-alignment measure from binarized-prediction counts.

    Works elementwise for scalar counts or 256-length threshold vectors.
    """
    pred_fg = fg_fg + fg_bg
    pred_bg = gt_size - pred_fg
    if gt_fg_count == 0:
        enhanced_total = pred_bg
    elif gt_fg_count == gt_size:
        enhanced_total = pred_fg
    else:
        bg_fg = gt_fg_count - fg_fg
        bg_bg = pred_bg - bg_fg
        parts = [fg_fg, fg_bg, bg_fg, bg_bg]
        mean_pred = pred_fg / gt_size
        mean_gt = gt_fg_count / gt_size
        combos = [
            (1 - mean_pred, 1 - mean_gt),
            (1 - mean_pred, 0 - mean_gt),
            (0 - mean_pred, 1 - mean_gt),
            (0 - mean_pred, 0 - mean_gt),
        ]
        enhanced_total = 0.0
        for part, (dp, dg) in zip(parts, combos):
            align = 2 * dp * dg / (dp**2 + dg**2 + _EPS)
            enhanced_total = enhanced_total + ((align + 1) ** 2 / 4) * part
    return enhanced_total / (gt_size - 1 + _EPS)


def _threshold_histograms(pred: np.ndarray, gt: np.ndarray):
    """Counts of pred>=t pixels inside/outside GT for t = 255..0.

    Returns (fg_counts[256], bg_counts[256]) via reversed cumulative
    histograms of the uint8 prediction.
    """
    pred_u8 = (pred * 255).astype(np.uint8)
    bins = np.arange(257)
    fg_hist, _ = np.histogram(pred_u8[gt], bins=bins)
    bg_hist, _ = np.histogram(pred_u8[~gt], bins=bins)
    return (
        np.cumsum(fg_hist[::-1]),
        np.cumsum(bg_hist[::-1]),
    )


class Emeasure:
    def __init__(self):
        self.adaptive = []
        self.curves = []

    def step(self, pred: np.ndarray, gt: np.ndarray):
        pred, gt = prepare_pred_gt(pred, gt)
        gt_fg = int(np.count_nonzero(gt))
        gt_size = gt.size

        # adaptive threshold = min(2 * mean, 1)
        thr = min(2 * pred.mean(), 1.0)
        binar = pred >= thr
        fg_fg = np.count_nonzero(binar & gt)
        fg_bg = np.count_nonzero(binar & ~gt)
        self.adaptive.append(_em_from_counts(fg_fg, fg_bg, gt_fg, gt_size))

        fg_w, bg_w = _threshold_histograms(pred, gt)
        self.curves.append(
            _em_from_counts(
                fg_w.astype(np.float64), bg_w.astype(np.float64), gt_fg,
                gt_size,
            )
        )

    def get_results(self):
        return dict(
            em=dict(
                adp=np.mean(np.asarray(self.adaptive, np.float64)),
                curve=np.mean(np.asarray(self.curves, np.float64), axis=0),
            )
        )


# ------------------------------------------------------------- F-measure


class Fmeasure:
    def __init__(self, beta: float = 0.3):
        self.beta = beta
        self.adaptive = []
        self.precisions = []
        self.recalls = []
        self.curves = []

    def step(self, pred: np.ndarray, gt: np.ndarray):
        pred, gt = prepare_pred_gt(pred, gt)

        thr = min(2 * pred.mean(), 1.0)
        binar = pred >= thr
        inter = np.count_nonzero(binar & gt)
        if inter == 0:
            self.adaptive.append(0.0)
        else:
            prec = inter / np.count_nonzero(binar)
            rec = inter / np.count_nonzero(gt)
            self.adaptive.append(
                (1 + self.beta) * prec * rec / (self.beta * prec + rec)
            )

        tp, bg = _threshold_histograms(pred, gt)
        total_pos = np.maximum(tp + bg, 1)
        gt_count = max(np.count_nonzero(gt), 1)
        precision = tp / total_pos
        recall = tp / gt_count
        numer = (1 + self.beta) * precision * recall
        denom = np.where(numer == 0, 1, self.beta * precision + recall)
        self.precisions.append(precision)
        self.recalls.append(recall)
        self.curves.append(numer / denom)

    def get_results(self):
        return dict(
            fm=dict(
                adp=np.mean(np.asarray(self.adaptive, np.float64)),
                curve=np.mean(np.asarray(self.curves, np.float64), axis=0),
            ),
            pr=dict(
                p=np.mean(np.asarray(self.precisions, np.float64), axis=0),
                r=np.mean(np.asarray(self.recalls, np.float64), axis=0),
            ),
        )


# ------------------------------------------------------------- Dice / IoU


class Dice(_Streaming):
    """Soft Dice *distance* (1 - Dice), matching the reference's DICE class
    (eval/metrics.py:400-426) which feeds raw (already normalized) maps."""

    def step(self, pred: np.ndarray, gt: np.ndarray):
        smooth = 1.0
        p, g = pred.ravel(), gt.ravel()
        inter = (p * g).sum()
        dice = 2 * (inter + smooth) / (p.sum() + g.sum() + smooth)
        self._push(1 - dice)
        return self._scores[-1]

    def get_results(self):
        return self._mean()


class Medical:
    """Threshold-sweep Sen/Spe/Dice/IoU curves (256 thresholds, 1 -> 0).

    Vectorized equivalent of the offline evaluator's Medical metric
    (eval/eval_vcod/metrics.py:399-465): instead of a python loop over 256
    thresholds, counts come from searchsorted on the sorted prediction
    values inside/outside the GT. Zero-overlap thresholds score 0 across
    the board (the reference's NumAnd == 0 rule).
    """

    def __init__(self):
        self.thresholds = np.linspace(1, 0, 256)
        self.sen, self.spe, self.dice, self.iou = [], [], [], []

    def step(self, pred: np.ndarray, gt: np.ndarray):
        pred, gt = prepare_pred_gt(pred, gt)
        pos = np.sort(pred[gt].ravel())
        neg = np.sort(pred[~gt].ravel())
        n_pos, n_neg = pos.size, neg.size

        thr = np.minimum(self.thresholds, 1.0)
        tp = n_pos - np.searchsorted(pos, thr, side="left")
        fp = n_neg - np.searchsorted(neg, thr, side="left")
        fn = n_pos - tp
        tn = n_neg - fp

        with np.errstate(divide="ignore", invalid="ignore"):
            sen = np.where(tp > 0, tp / max(n_pos, 1), 0.0)
            spe = np.where(tp > 0, tn / np.maximum(tn + fp, 1), 0.0)
            dice = np.where(tp > 0, 2 * tp / np.maximum(n_pos + tp + fp, 1),
                            0.0)
            iou = np.where(tp > 0, tp / np.maximum(fn + tp + fp, 1), 0.0)
        self.sen.append(sen)
        self.spe.append(spe)
        self.dice.append(dice)
        self.iou.append(iou)

    def get_results(self):
        """Frame-averaged 256-threshold curves, one per quantity.

        Keys are the raw curve names; mean*/max* aggregation over a curve
        is the *caller's* choice (mean vs max over thresholds, applied
        after cross-sequence averaging — eval_offline.evaluate_dataset).
        The reference returned the same curve under both mean* and max*
        keys (eval/eval_vcod/metrics.py:458-465), a trap for any caller
        that read e.g. ``maxSen`` expecting a scalar.
        """
        return dict(
            sen=np.mean(np.asarray(self.sen, np.float64), axis=0),
            spe=np.mean(np.asarray(self.spe, np.float64), axis=0),
            dice=np.mean(np.asarray(self.dice, np.float64), axis=0),
            iou=np.mean(np.asarray(self.iou, np.float64), axis=0),
        )


class IoU(_Streaming):
    """Soft IoU over raw maps (reference eval/metrics.py:488-492)."""

    def step(self, pred: np.ndarray, gt: np.ndarray):
        inter = (gt * pred).sum()
        union = gt.sum() + pred.sum() - inter
        self._push(inter / union if union > 0 else 0.0)
        return self._scores[-1]

    def get_results(self):
        return self._mean()
