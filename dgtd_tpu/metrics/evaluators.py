"""Streaming metric evaluators with reference-parity reduction.

The reference wraps *cumulative* py_sod_metrics evaluators: every batch it
steps the persistent evaluator and appends the cumulative result-so-far, then
``compute_metrics`` averages the appended values (twig/metric/Smeasure.py:18-37
— i.e. with val batch_size 1 the reported number is the mean over k of the
prefix-cumulative metric, NOT the plain dataset mean; SURVEY.md §2.6).

Each evaluator here reports both:
  * ``parity`` reduction (default): exact replica of that quirk;
  * ``strict`` reduction: the plain per-image mean (curve metrics: max of the
    dataset-mean curve), what py_sod_metrics would report standalone.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..core.registry import METRICS, export
from . import sod_metrics as S


class BaseSODMetric:
    """Shared machinery: uint8 conversion, per-image stepping, reductions."""

    default_prefix = "COD"

    def __init__(self, collect_device: str = "cpu", prefix: Optional[str] = None, data_range: float = 1.0):
        self.prefix = prefix or self.default_prefix
        self.reset()

    def reset(self):
        self._appended: List[float] = []
        self._count = 0
        self._state: Dict[str, np.ndarray] = {}

    # -- subclass API ------------------------------------------------------
    def _step(self, pred: np.ndarray, gt: np.ndarray) -> None:
        raise NotImplementedError

    def _cumulative_value(self) -> float:
        raise NotImplementedError

    name = "metric"
    #: whether process_stats() can consume metrics.device.batch_statistics
    supports_device_stats = False

    def _step_stats(self, stats, i: int) -> None:
        raise NotImplementedError

    def process_stats(self, stats) -> None:
        """Update from on-device per-image statistics (metrics/device.py) —
        same cumulative-append semantics as process()."""
        b = len(np.asarray(stats["sm"]))
        for i in range(b):
            self._step_stats(stats, i)
            self._count += 1
        self._appended.append(self._cumulative_value())

    # ----------------------------------------------------------------------
    def process(self, preds, gts) -> None:
        """preds/gts: (B, H, W) or (B, H, W, 1) float arrays in [0, 1]."""
        preds = np.asarray(preds)
        gts = np.asarray(gts)
        # normalize EACH rank independently: keying both off preds.ndim let
        # mixed-rank inputs broadcast into silently-wrong metric values
        if preds.ndim == 4:
            preds = preds[..., 0]
        if gts.ndim == 4:
            gts = gts[..., 0]
        if preds.shape != gts.shape:
            raise ValueError(f"pred/gt shape mismatch: {preds.shape} vs {gts.shape}")
        preds_u8 = (preds * 255).astype(np.uint8)
        gts_u8 = (gts * 255).astype(np.uint8)
        for p, g in zip(preds_u8, gts_u8):
            pred, gt = S.prepare(p, g)
            self._step(pred, gt)
            self._count += 1
        self._appended.append(self._cumulative_value())

    def compute(self) -> Dict[str, float]:
        parity = float(np.mean(self._appended)) if self._appended else float("nan")
        return {
            f"{self.prefix}/{self.name}": parity,
            f"{self.prefix}/{self.name}_strict": self._strict_value(),
        }

    def _strict_value(self) -> float:
        return self._cumulative_value()


@export
@METRICS.register
class Smeasure(BaseSODMetric):
    """S-measure (twig/metric/Smeasure.py:8-37)."""

    name = "Smeasure"
    supports_device_stats = True

    def reset(self):
        super().reset()
        self._sum = 0.0

    def _step(self, pred, gt):
        self._sum += S.smeasure(pred, gt)

    def _step_stats(self, stats, i):
        self._sum += float(stats["sm"][i])

    def _cumulative_value(self):
        return self._sum / max(self._count, 1)


@export
@METRICS.register
class MAE(BaseSODMetric):
    """MAE (twig/metric/MAE.py:8-37)."""

    name = "MAE"
    supports_device_stats = True

    def reset(self):
        super().reset()
        self._sum = 0.0

    def _step(self, pred, gt):
        self._sum += S.mae(pred, gt)

    def _step_stats(self, stats, i):
        self._sum += float(stats["mae_sum"][i]) / float(stats["n_pixels"][i])

    def _cumulative_value(self):
        return self._sum / max(self._count, 1)


class _CurveMetric(BaseSODMetric):
    """Curve metrics report max over the running mean 256-point curve."""

    def reset(self):
        super().reset()
        self._curve_sum = np.zeros(256, np.float64)

    def _cumulative_value(self):
        return float((self._curve_sum / max(self._count, 1)).max())


@export
@METRICS.register
class Fmeasure(_CurveMetric):
    """max F-measure over 256 thresholds (twig/metric/Fmeasure.py:8-37)."""

    name = "Fmeasure"
    supports_device_stats = True

    def _step(self, pred, gt):
        fg_hist, bg_hist = S.threshold_histograms(pred, gt)
        self._curve_sum += S.fmeasure_curve(fg_hist, bg_hist, int(np.count_nonzero(gt)))

    def _step_stats(self, stats, i):
        self._curve_sum += S.fmeasure_curve(
            np.asarray(stats["fg_hist"][i], np.float64),
            np.asarray(stats["bg_hist"][i], np.float64),
            int(stats["gt_count"][i]),
        )


@export
@METRICS.register
class Emeasure(_CurveMetric):
    """max E-measure over 256 thresholds (twig/metric/Emeasure.py:8-36)."""

    name = "Emeasure"
    supports_device_stats = True

    def _step(self, pred, gt):
        fg_hist, bg_hist = S.threshold_histograms(pred, gt)
        self._curve_sum += S.emeasure_curve(
            fg_hist, bg_hist, int(np.count_nonzero(gt)), gt.size
        )

    def _step_stats(self, stats, i):
        self._curve_sum += S.emeasure_curve(
            np.asarray(stats["fg_hist"][i], np.float64),
            np.asarray(stats["bg_hist"][i], np.float64),
            int(stats["gt_count"][i]),
            int(stats["n_pixels"][i]),
        )


@export
@METRICS.register
class WeightedFmeasure(BaseSODMetric):
    """Weighted F-measure (registered but disabled in reference recipes —
    twig/metric/WeightedFmeasure.py:1-37)."""

    name = "WeightedFmeasure"

    def reset(self):
        super().reset()
        self._sum = 0.0

    def _step(self, pred, gt):
        self._sum += S.weighted_fmeasure(pred, gt)

    def _cumulative_value(self):
        return self._sum / max(self._count, 1)


@export
@METRICS.register
class meanIntersectionOverUnion:
    """Multi-class mIoU with the reference's exact contract
    (twig/metric/mIOU.py:32-58): pred is a (N,H,W,C) float score map —
    softmax over classes then argmax; gt is a (N,H,W,1) float map in [0,1]
    that is scaled by 255 and clamped to ``num_classes-1``; per-batch mIoU
    (zero-diagonal classes count as 0 in a /num_classes mean) averaged over
    ``process`` calls (mIOU.py:61-71).

    Extension beyond the reference (which cannot consume this model family's
    1-channel sigmoid output at all): a single-channel pred with
    ``num_classes=2`` is thresholded at ``threshold`` into {0,1} classes.
    Registered surface — not used by either recipe's val_evaluator.
    """

    def __init__(self, num_classes: int = 2, threshold: float = 0.5, prefix: str = "COD"):
        self.num_classes = num_classes
        self.threshold = threshold
        self.prefix = prefix
        self.reset()

    def reset(self):
        self._ious: List[float] = []

    def process(self, preds, gts):
        preds = np.asarray(preds, np.float32)
        gts = np.asarray(gts, np.float32)
        if preds.ndim == 3:
            preds = preds[..., None]
        if gts.ndim == 4:
            gts = gts[..., 0]
        if preds.shape[-1] == 1:
            # binary extension: threshold the sigmoid probability map
            pc = (preds[..., 0] >= self.threshold).astype(np.int64)
            gc = (gts >= 0.5).astype(np.int64)
        else:
            # reference path: softmax -> argmax over the class channel
            # (softmax is monotone per-pixel so argmax of scores suffices)
            pc = np.argmax(preds, axis=-1).astype(np.int64)
            gc = np.minimum(gts * 255.0, self.num_classes - 1).astype(np.int64)
        # one mIoU per process() call (= per batch), like mIOU.py:61-67
        self._ious.append(S.miou(pc, gc, self.num_classes))

    def compute(self):
        return {f"{self.prefix}/mIoU": float(np.mean(self._ious)) if self._ious else float("nan")}
