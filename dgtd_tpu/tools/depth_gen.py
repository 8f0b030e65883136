"""Offline depth-map generation (reference ``dino.py`` equivalent).

The reference produces per-image ``*_depth.png`` files with a DINOv2 ViT-L/14
+ DPT depth head (/root/reference/dino.py:104-247) which the datasets then
load via ``depth_dir``. This is L6 offline preprocessing (SURVEY.md §1) —
host-side by design, not part of the TPU hot path.

Here the depther is any Hugging Face DPT checkpoint loaded from a LOCAL path
(zero-egress environments must pre-download, e.g. ``Intel/dpt-large`` or a
DINOv2-DPT export); ``--estimator sobel`` provides a weights-free fallback
(blur + inverted gradient-magnitude pseudo-depth) so the pipeline stays
runnable end-to-end without external downloads.

Usage:
    python -m dgtd_tpu.tools.depth_gen --image-dir data/Imgs --out-dir data/depth \
        [--model-path /path/to/dpt] [--estimator dpt|sobel]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image


def sobel_pseudo_depth(img: np.ndarray) -> np.ndarray:
    """Weights-free fallback: smoothed inverse gradient magnitude in [0,1]."""
    gray = img.mean(axis=-1)
    gy, gx = np.gradient(gray)
    mag = np.sqrt(gx**2 + gy**2)
    # box-blur x3 approximates a gaussian
    for _ in range(3):
        mag = (
            np.pad(mag, 1, mode="edge")[:-2, 1:-1]
            + np.pad(mag, 1, mode="edge")[2:, 1:-1]
            + np.pad(mag, 1, mode="edge")[1:-1, :-2]
            + np.pad(mag, 1, mode="edge")[1:-1, 2:]
            + mag
        ) / 5.0
    mag = mag / (mag.max() + 1e-8)
    return 1.0 - mag


def dpt_depth(model, processor, image: Image.Image) -> np.ndarray:
    import torch

    inputs = processor(images=image, return_tensors="pt")
    with torch.no_grad():
        out = model(**inputs).predicted_depth[0].numpy()
    out = out - out.min()
    return out / (out.max() + 1e-8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--estimator", choices=["dpt", "sobel"], default="sobel")
    ap.add_argument("--model-path", default=None, help="local HF DPT checkpoint dir")
    ap.add_argument("--suffix", default="_depth.png")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    model = processor = None
    if args.estimator == "dpt":
        from transformers import AutoImageProcessor, DPTForDepthEstimation

        if not args.model_path:
            sys.exit("--estimator dpt requires --model-path (zero-egress environment)")
        processor = AutoImageProcessor.from_pretrained(args.model_path)
        model = DPTForDepthEstimation.from_pretrained(args.model_path).eval()

    files = sorted(os.listdir(args.image_dir))
    for i, fname in enumerate(files):
        path = os.path.join(args.image_dir, fname)
        try:
            with Image.open(path) as im:
                im = im.convert("RGB")
                if args.estimator == "dpt":
                    depth = dpt_depth(model, processor, im)
                    depth = np.asarray(
                        Image.fromarray((depth * 255).astype(np.uint8)).resize(im.size, Image.BILINEAR)
                    ) / 255.0
                else:
                    depth = sobel_pseudo_depth(np.asarray(im, np.float32) / 255.0)
        except (OSError, ValueError) as e:
            print(f"skip {fname}: {e}")
            continue
        name = os.path.splitext(fname)[0]
        Image.fromarray((depth * 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, name + args.suffix)
        )
        if i % 100 == 0:
            print(f"{i}/{len(files)}")
    print(f"wrote {len(files)} depth maps -> {args.out_dir}")


if __name__ == "__main__":
    main()
