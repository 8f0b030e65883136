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
_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def _list_images(d: str) -> List[str]:
    files = sorted(f for f in os.listdir(d) if f.lower().endswith(_EXTS))
    if not files:
        raise SystemExit(f"no image files in {d}")
    return files


def run_eval(pred_dir: str, gt_dir: str, metric_names=DEFAULT_METRICS, strict_pairing: bool = True):
    from PIL import Image

    from ..core.registry import METRICS

    preds = _list_images(pred_dir)
    gts = _list_images(gt_dir)
    if len(preds) != len(gts):
        raise SystemExit(
            f"{len(preds)} predictions vs {len(gts)} GT masks — must pair 1:1"
        )
    if strict_pairing:
        mism = [
            (p, g)
            for p, g in zip(preds, gts)
            if os.path.splitext(p)[0] != os.path.splitext(g)[0]
        ]
        if mism:
            raise SystemExit(
                f"{len(mism)} basename mismatches (e.g. {mism[0][0]!r} vs "
                f"{mism[0][1]!r}); pass --no-strict-pairing to pair by sorted "
                "order anyway"
            )

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
