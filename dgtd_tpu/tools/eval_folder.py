"""Standalone metric evaluation over saved prediction maps.

The reference can only produce its E/F/S/MAE numbers by running the full
model through MMEngine's ValLoop (script/test.sh:1); evaluating maps saved
by ANY method against ground truth — the standard SOD/COD research workflow
(py_sod_metrics' own usage mode) — has no entry point there. This tool runs
this package's metric suite over two folders of PNGs:

    python -m dgtd_tpu.tools.eval_folder \
        --pred-dir <maps/> --gt-dir <GT/> \
        [--metrics Smeasure MAE Fmeasure Emeasure WeightedFmeasure]

Files pair by sorted order with a basename-stem check (the loader
convention, data/datasets.py); predictions are read as 8-bit grayscale,
scaled to [0, 1], and resized to each GT's resolution (the reference's
predict mode upsamples to label size, cod.py:149-155). Both reductions are
reported: ``parity`` (the reference's cumulative-average quirk,
twig/metric/Smeasure.py:18-37) and ``strict`` (plain per-image mean).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List

import numpy as np

DEFAULT_METRICS = ("Smeasure", "MAE", "Fmeasure", "Emeasure", "WeightedFmeasure")

#: prediction-name decorations stripped before stem matching — the
#: visualizer writes ``{name}_output.png`` (train/loop.py), other methods
#: commonly use ``_pred``/``_mask``
_PRED_SUFFIXES = ("_output", "_pred", "_mask")


def _stem(fname: str, strip_suffixes=()) -> str:
    stem = os.path.splitext(fname)[0]
    for s in strip_suffixes:
        if stem.endswith(s):
            return stem[: -len(s)]
    return stem


def run_eval(pred_dir: str, gt_dir: str, metric_names=DEFAULT_METRICS, strict_pairing: bool = True):
    from PIL import Image

    from ..core.registry import METRICS
    from ..utils.files import list_images

    preds = list_images(pred_dir)
    gts = list_images(gt_dir)
    if len(preds) != len(gts):
        raise SystemExit(
            f"{len(preds)} predictions vs {len(gts)} GT masks — must pair 1:1"
        )
    if strict_pairing:
        # pair by STEM MAP, not sorted order: suffixed prediction names
        # (img1_output.png) sort differently from their GTs (img1.png), so
        # positional pairing would silently mispair them
        gt_by_stem = {_stem(g): g for g in gts}
        if len(gt_by_stem) != len(gts):
            raise SystemExit("duplicate GT basename stems — cannot pair by stem")
        pairing = []
        unmatched = []
        for p in preds:
            g = gt_by_stem.get(_stem(p, _PRED_SUFFIXES))
            (pairing.append((p, g)) if g else unmatched.append(p))
        if unmatched:
            raise SystemExit(
                f"{len(unmatched)} predictions have no GT stem match (e.g. "
                f"{unmatched[0]!r}); rename, or pass --no-strict-pairing to "
                "pair by sorted order (ONLY safe when both folders use the "
                "same naming scheme)"
            )
        preds, gts = zip(*pairing)

    metrics = [METRICS.get(n)() for n in metric_names]
    for p, g in zip(preds, gts):
        with Image.open(os.path.join(gt_dir, g)) as gm:
            gt = np.asarray(gm.convert("L"), np.float32) / 255.0
        with Image.open(os.path.join(pred_dir, p)) as pm:
            pm = pm.convert("L")
            if pm.size != (gt.shape[1], gt.shape[0]):
                # reference predict mode upsamples to label size (cod.py:149)
                pm = pm.resize((gt.shape[1], gt.shape[0]), Image.BILINEAR)
            pred = np.asarray(pm, np.float32) / 255.0
        # ValLoop parity: one image per process() call (bs1)
        for m in metrics:
            m.process(pred[None, :, :, None], gt[None, :, :, None])

    results = {}
    for m in metrics:
        results.update(m.compute())
    return {k: float(v) for k, v in results.items()}, len(preds)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--pred-dir", required=True, help="folder of prediction maps")
    ap.add_argument("--gt-dir", required=True, help="folder of ground-truth masks")
    ap.add_argument("--metrics", nargs="+", default=list(DEFAULT_METRICS))
    ap.add_argument(
        "--no-strict-pairing",
        action="store_true",
        help="pair by sorted order without the basename-stem check",
    )
    args = ap.parse_args(argv)
    results, n = run_eval(
        args.pred_dir, args.gt_dir, args.metrics, strict_pairing=not args.no_strict_pairing
    )
    for k in sorted(results):
        print(f"{k:<28}{results[k]:.5f}")
    print(json.dumps({"n_images": n, **{k: round(v, 6) for k, v in results.items()}}))
    return results


if __name__ == "__main__":
    main()
