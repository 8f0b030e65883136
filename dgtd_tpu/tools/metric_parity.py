"""End-to-end metric-parity runbook: reference torch stack vs this stack.

The reference's ultimate correctness claim is the E/F/S/MAE table on the
benchmark datasets (/root/reference/script/test.sh:1, config/cod.yml:28-37).
This tool composes the last untested seam — predict → metrics, end to end on
IDENTICAL weights — so that producing the actual benchmark table needs
nothing but the data:

    python -m dgtd_tpu.tools.metric_parity \
        --image-dir <Imgs/> --gt-dir <GT/> --depth-dir <Depth/> \
        --checkpoint <reference .pth | converted .npz> [--size 384]

For every image (sorted, preprocessed once, shared by both stacks):
  * REFERENCE stack: the actual twig/model/cod.py imported on CPU torch
    (tools/ref_oracle.py stubs), weights loaded from the checkpoint,
    predict-mode output ``sigmoid(interpolate(P1[-1]+P2, gt))``
    (cod.py:149-219);
  * THIS stack: the same checkpoint through ``convert_ckpt full`` grafted
    into the Flax model, jitted ``predict``.
Both prediction sets then run through THIS package's metric evaluators
(reference ValLoop parity: batch size 1, cumulative-average reduction) and
the per-metric deltas are printed as a table + one JSON line.

CI fixture: tests/test_metric_parity.py drives this with 5 synthetic RGB-D
images and a random-init reference ``state_dict()`` — float-tolerance parity
of the full predict→metric composition without benchmark data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data.device_norm import IMAGENET_MEAN, IMAGENET_STD

METRIC_NAMES = ("Emeasure", "Fmeasure", "Smeasure", "MAE")


def load_folder(image_dir: str, gt_dir: str, depth_dir: Optional[str], size: int):
    """Dataset-parity preprocessing (cod10k_camo_train.py:32-38,78): RGB
    bilinear-resized to size², /255, ImageNet-normalized; GT and depth as
    8-bit 'L'. Depths pair 1:1 by sorted order (FolderSODDataset contract)."""
    from PIL import Image

    from ..utils.files import list_images as ls

    files = ls(image_dir)
    gts = ls(gt_dir)
    if len(files) != len(gts):
        raise SystemExit(f"{len(files)} images vs {len(gts)} GT masks — must pair 1:1")
    depths = ls(depth_dir) if depth_dir else None
    if depths is not None and len(depths) != len(files):
        raise SystemExit(f"{len(depths)} depths vs {len(files)} images — must pair 1:1")

    for i, fname in enumerate(files):
        with Image.open(os.path.join(image_dir, fname)) as im:
            rgb = np.asarray(im.convert("RGB").resize((size, size), Image.BILINEAR), np.float32) / 255.0
        img = (rgb - IMAGENET_MEAN) / IMAGENET_STD
        with Image.open(os.path.join(gt_dir, gts[i])) as gm:
            gt = np.asarray(gm.convert("L").resize((size, size), Image.BILINEAR), np.float32) / 255.0
        if depths is not None:
            with Image.open(os.path.join(depth_dir, depths[i])) as dm:
                dep = np.asarray(dm.convert("L").resize((size, size), Image.BILINEAR), np.float32) / 255.0
        else:
            dep = np.zeros((size, size), np.float32)
        yield fname, img, dep[..., None], gt[..., None]


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Reference-schema state dict from a .pth (torch) or converted .npz."""
    if path.endswith(".npz"):
        raise SystemExit(
            "metric_parity needs the RAW reference .pth (both stacks start "
            "from the same state_dict); converted .npz only feeds our side"
        )
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for wrap in ("state_dict", "model"):
        if isinstance(ckpt, dict) and wrap in ckpt:
            ckpt = ckpt[wrap]
    return ckpt


def build_reference_predict(model_name: str, state_dict):
    """The actual reference model on CPU torch; returns predict(img, dep)."""
    import torch

    from .ref_oracle import load_reference_cod, load_reference_module

    if model_name == "cod":
        ref = load_reference_cod()
        model = ref.cod()
    elif model_name == "baseline":
        ref = load_reference_module("twig/model/baseline.py")
        model = ref.baseline()
    else:
        raise SystemExit(f"unsupported --model {model_name}")
    if state_dict is not None:
        missing, unexpected = model.load_state_dict(state_dict, strict=False)
        if missing:
            print(f"reference load: {len(missing)} missing keys (kept at init)")
    model.eval()

    def predict(img_hwc: np.ndarray, dep_hw1: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(img_hwc.transpose(2, 0, 1)[None])
        d = torch.from_numpy(dep_hw1.transpose(2, 0, 1)[None])
        with torch.no_grad():
            _, stages, pred2 = model.hitnet(x, d)
            # predict-mode composition (cod.py:149-155): last stage + P2,
            # bilinear to the label size, sigmoid
            out = torch.nn.functional.interpolate(
                stages[-1] + pred2, size=x.shape[2:], mode="bilinear"
            ).sigmoid()
        return out.numpy()[0].transpose(1, 2, 0)

    return predict


def build_our_predict(model_name: str, state_dict, size: int, fp32: bool = True):
    """The same weights through convert_ckpt → the jitted Flax predict."""
    import jax
    import jax.numpy as jnp

    from ..core.registry import MODELS
    from ..train.hooks import graft_flat_params
    from .convert_ckpt import convert_state_dict

    state = {k: np.asarray(v) for k, v in state_dict.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
    flat, skipped = convert_state_dict(state, "full")
    model = MODELS.get(model_name)(dtype=jnp.float32 if fp32 else jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), (1, size, size, 3))
    params, loaded_p, missed_p = graft_flat_params(variables["params"], flat)
    stats, loaded_s, missed_s = graft_flat_params(
        variables.get("batch_stats", {}), flat, prefix="batch_stats/"
    )
    if missed_p:
        raise SystemExit(f"converted checkpoint left {len(missed_p)} params at init: {missed_p[:5]}")
    variables = {"params": params, "batch_stats": stats}
    predict = jax.jit(lambda im, d: model.predict(variables, im, d)[0])

    def run(img_hwc: np.ndarray, dep_hw1: np.ndarray) -> np.ndarray:
        return np.asarray(predict(jnp.asarray(img_hwc[None]), jnp.asarray(dep_hw1[None])))[0]

    return run


def make_metrics():
    from ..core.registry import METRICS

    return [METRICS.get(n)() for n in METRIC_NAMES]


def run_parity(
    image_dir: str,
    gt_dir: str,
    depth_dir: Optional[str],
    checkpoint: Optional[str],
    model_name: str = "cod",
    size: int = 384,
    state_dict=None,
) -> Dict[str, Dict[str, float]]:
    """Run both stacks over the folder; returns {'reference': {...},
    'ours': {...}, 'delta': {...}, 'pred_max_abs_delta': float}."""
    if state_dict is None:
        state_dict = load_state_dict(checkpoint)
    ref_predict = build_reference_predict(model_name, state_dict)
    our_predict = build_our_predict(model_name, state_dict, size)

    ref_metrics = make_metrics()
    our_metrics = make_metrics()
    max_pred_delta, n = 0.0, 0
    for fname, img, dep, gt in load_folder(image_dir, gt_dir, depth_dir, size):
        p_ref = ref_predict(img, dep)
        p_our = our_predict(img, dep)
        max_pred_delta = max(max_pred_delta, float(np.abs(p_ref - p_our).max()))
        # ValLoop parity: one image per process() call (bs1, config/cod.yml:28)
        for m in ref_metrics:
            m.process(p_ref[None], gt[None])
        for m in our_metrics:
            m.process(p_our[None], gt[None])
        n += 1
        print(f"{n}: {fname}  pred|Δ|={max_pred_delta:.2e}", flush=True)

    ref_vals: Dict[str, float] = {}
    our_vals: Dict[str, float] = {}
    for m in ref_metrics:
        ref_vals.update(m.compute())
    for m in our_metrics:
        our_vals.update(m.compute())
    delta = {k: abs(ref_vals[k] - our_vals[k]) for k in ref_vals}
    return {
        "reference": ref_vals,
        "ours": our_vals,
        "delta": delta,
        "pred_max_abs_delta": max_pred_delta,
        "n_images": n,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--depth-dir", default=None)
    ap.add_argument("--checkpoint", required=True, help="reference-schema .pth")
    ap.add_argument("--model", default="cod", choices=["cod", "baseline"])
    ap.add_argument("--size", type=int, default=384)
    args = ap.parse_args(argv)

    result = run_parity(
        args.image_dir, args.gt_dir, args.depth_dir, args.checkpoint,
        model_name=args.model, size=args.size,
    )
    print(f"\n{'metric':<24}{'reference':>12}{'ours':>12}{'|delta|':>12}")
    for k in sorted(result["reference"]):
        print(
            f"{k:<24}{result['reference'][k]:>12.5f}{result['ours'][k]:>12.5f}"
            f"{result['delta'][k]:>12.2e}"
        )
    print(f"\nmax per-pixel prediction delta: {result['pred_max_abs_delta']:.2e}")
    print(json.dumps({
        "n_images": result["n_images"],
        "pred_max_abs_delta": result["pred_max_abs_delta"],
        "metric_max_abs_delta": max(result["delta"].values()),
        **{f"ref:{k}": round(v, 6) for k, v in result["reference"].items()},
        **{f"ours:{k}": round(v, 6) for k, v in result["ours"].items()},
    }))
    return result


if __name__ == "__main__":
    main()
