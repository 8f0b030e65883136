"""Offline depth-map generation (reference ``dino.py`` equivalent).

The reference produces per-image ``*_depth.png`` files with a DINOv2 ViT-L/14
+ DPT depth head (/root/reference/dino.py:104-247) which the datasets then
load via ``depth_dir``. This is L6 offline preprocessing (SURVEY.md §1) —
host-side orchestration around a jitted TPU forward, not part of the train
hot path.

Estimators:
  * ``dinov2`` — the reference's exact assembly, TPU-native: DINOv2 ViT-*/14
    backbone + DPT head (models/dinov2.py, models/dpt.py) from locally
    converted checkpoints (``convert_ckpt dinov2`` / ``dpt_head``; raw .pth
    accepted too — converted on the fly). Zero-egress environments must
    pre-download ``dinov2_vit*14_pretrain.pth`` and
    ``dinov2_vit*14_nyu_dpt_head.pth``.
  * ``dpt`` — any local Hugging Face DPT checkpoint (torch).
  * ``sobel`` — weights-free fallback (blur + inverted gradient magnitude)
    so the pipeline stays runnable end-to-end without downloads.

Rendering: the reference saves a **magma_r colormapped RGB** PNG
(dino.py:186-193) which the datasets then re-read as 8-bit grayscale
(cod10k_camo_train.py:78) — ``--render magma`` replicates that pipeline
exactly; ``--render gray`` (default) skips the colormap round-trip and saves
the normalized depth directly.

Usage:
    python -m dgtd_tpu.tools.depth_gen --image-dir data/Imgs --out-dir data/depth \
        [--estimator dinov2|dpt|sobel] [--backbone-ckpt ...] [--head-ckpt ...] \
        [--arch vitl14] [--render magma|gray] [--long-side 518]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np
from PIL import Image

# DINOv2 depth-eval preprocessing constants (dino.py:177-185): images scaled
# to [0,255] then ImageNet mean/std normalized.
_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


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


def render_depth(values: np.ndarray, colormap: str = "magma_r") -> np.ndarray:
    """Reference ``render_depth`` parity (dino.py:186-193): min-max normalize
    then colormap to RGB uint8."""
    import matplotlib

    lo, hi = values.min(), values.max()
    norm = (values - lo) / (hi - lo + 1e-12)
    colors = matplotlib.colormaps[colormap](norm, bytes=True)
    return colors[..., :3]


class Dinov2Depther:
    """Converted-checkpoint DINOv2+DPT depther with per-shape jit caching."""

    def __init__(self, arch: str, backbone_ckpt: str, head_ckpt: str, dtype_str: str = "bfloat16"):
        import jax
        import jax.numpy as jnp

        from ..models.dpt import DinoDPTDepther
        from ..train.hooks import graft_flat_params

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_str]
        backbone = self._load_flat(backbone_ckpt, "dinov2")
        head = self._load_flat(head_ckpt, "dpt_head")
        # classification-vs-regression head auto-detected from conv_depth
        n_out = head["conv_depth/Conv_0/kernel"].shape[-1]
        self.model = DinoDPTDepther(
            arch=arch, classify=n_out > 1, n_bins=max(n_out, 2), dtype=dtype
        )
        # init at the pretrain grid once (eval_shape: no FLOPs), then graft
        var = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 518, 518, 3)))
        )
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), var)["params"]
        flat = {f"backbone/{k}": v for k, v in backbone.items()}
        flat.update({f"decode_head/{k}": v for k, v in head.items()})
        params, loaded, missed = graft_flat_params(params, flat)
        if missed:
            # every depther param must come from the checkpoints — running a
            # 300M-param model with zero-init leaves produces silent garbage
            raise ValueError(
                f"depther graft left {len(missed)} params uninitialized "
                f"(loaded {len(loaded)}); first misses: {missed[:5]} — "
                "wrong --arch for this checkpoint?"
            )
        self.params = {"params": params}
        self._jitted = {}
        self._jax = jax

    @staticmethod
    def _load_flat(path: str, kind: str):
        from .convert_ckpt import convert_state_dict

        if path.endswith(".npz"):
            with np.load(path) as z:
                return dict(z)
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        for wrap in ("model", "state_dict"):
            if isinstance(ckpt, dict) and wrap in ckpt:
                ckpt = ckpt[wrap]
        state = {k: v.numpy() for k, v in ckpt.items() if hasattr(v, "numpy")}
        out, _ = convert_state_dict(state, kind)
        return out

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """img: (H, W, 3) float32 in [0,1] -> (H, W) raw depth (model units)."""
        x = (img * 255.0 - _MEAN) / _STD
        x = x[None]
        shape = x.shape
        if shape not in self._jitted:
            self._jitted[shape] = self._jax.jit(
                lambda p, a: self.model.apply(p, a).astype(np.float32)
            )
        out = self._jitted[shape](self.params, x)
        return np.asarray(out)[0, :, :, 0]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--estimator", choices=["dinov2", "dpt", "sobel"], default="sobel")
    ap.add_argument("--backbone-ckpt", default=None, help="dinov2 backbone .npz/.pth")
    ap.add_argument("--head-ckpt", default=None, help="DPT head .npz/.pth")
    ap.add_argument("--arch", default="vitl14", choices=["vits14", "vitb14", "vitl14", "vitg14"])
    ap.add_argument("--model-path", default=None, help="local HF DPT checkpoint dir")
    ap.add_argument("--render", choices=["gray", "magma"], default="gray")
    ap.add_argument(
        "--long-side",
        type=int,
        default=0,
        help="resize so the long side is N before estimating (any estimator; "
        "output is resized back to the source size); 0 = native resolution "
        "like the reference's scale_factor=1 path (dino.py:234) — for dinov2 "
        "native means one XLA compile per unique image shape",
    )
    ap.add_argument("--suffix", default="_depth.png")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    model = processor = depther = None
    if args.estimator == "dpt":
        from transformers import AutoImageProcessor, DPTForDepthEstimation

        if not args.model_path:
            sys.exit("--estimator dpt requires --model-path (zero-egress environment)")
        processor = AutoImageProcessor.from_pretrained(args.model_path)
        model = DPTForDepthEstimation.from_pretrained(args.model_path).eval()
    elif args.estimator == "dinov2":
        if not (args.backbone_ckpt and args.head_ckpt):
            sys.exit("--estimator dinov2 requires --backbone-ckpt and --head-ckpt")
        depther = Dinov2Depther(args.arch, args.backbone_ckpt, args.head_ckpt)

    files = sorted(os.listdir(args.image_dir))
    written = 0
    for i, fname in enumerate(files):
        path = os.path.join(args.image_dir, fname)
        try:
            with Image.open(path) as im:
                im = im.convert("RGB")
                size = im.size
                if args.long_side:
                    scale = args.long_side / max(im.size)
                    im = im.resize(
                        (round(im.width * scale), round(im.height * scale)), Image.BILINEAR
                    )
                arr = np.asarray(im, np.float32) / 255.0
                if args.estimator == "dinov2":
                    depth = depther(arr)
                elif args.estimator == "dpt":
                    depth = dpt_depth(model, processor, im)
                else:
                    depth = sobel_pseudo_depth(arr)
        except (OSError, ValueError) as e:
            print(f"skip {fname}: {e}")
            continue
        # Resize the FLOAT depth back to the source size BEFORE rendering:
        # bilinear blending of colormapped uint8 RGB is not monotonic in the
        # magma_r ramp, so resizing after quantization would make the
        # grayscale values datasets re-read diverge from the true depths.
        if (depth.shape[1], depth.shape[0]) != size:
            depth = np.asarray(
                Image.fromarray(depth.astype(np.float32), mode="F").resize(
                    size, Image.BILINEAR
                )
            )
        if args.render == "magma":
            out_img = Image.fromarray(render_depth(depth))
        else:
            lo, hi = depth.min(), depth.max()
            out_img = Image.fromarray(
                ((depth - lo) / (hi - lo + 1e-12) * 255).astype(np.uint8)
            )
        name = os.path.splitext(fname)[0]
        out_img.save(os.path.join(args.out_dir, name + args.suffix))
        written += 1
        if i % 100 == 0:
            print(f"{i}/{len(files)}")
    print(f"wrote {written} depth maps -> {args.out_dir}")


if __name__ == "__main__":
    main()
