#!/usr/bin/env python
"""Standalone batch inference: images (+ depth maps) -> segmentation masks.

The reference's only inference path is the val loop with inline PNG dumps
(cod.py:149-219); this is the framework's dedicated serving CLI:

    python predict.py --checkpoint output/cod/epoch_100 \
        --image-dir data/Imgs --depth-dir data/depth --out-dir masks \
        [--size 384] [--batch 8] [--model cod]

Depth maps are matched by sorted order (reference dataset convention); with
--depth-dir omitted, a zero depth plane is used (prompts then carry only
texture information).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

def _enable_tpu_compile_cache():
    # Called from main(), not at import — backend init blocks forever on a
    # dead axon tunnel and would hang even --help (shared helper:
    # dgtd_tpu/utils/tpu_probe.py).
    from dgtd_tpu.utils.tpu_probe import enable_tpu_compile_cache

    enable_tpu_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None, help="orbax dir or .npz")
    ap.add_argument(
        "--bundle",
        default=None,
        help="serve from an exported AOT bundle dir (tools/export_serving.py) "
        "instead of building the model from code — mutually exclusive with "
        "--checkpoint/--model; images run one at a time through the bundle's "
        "resolution buckets",
    )
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--depth-dir", default=None)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--model", default="cod")
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument(
        "--uint8-io", action="store_true",
        help="ship post-resize uint8 to the device and normalize there "
        "(4x less host->device traffic; predictions differ from the float "
        "path only by input quantization <= 0.5/255)",
    )
    ap.add_argument(
        "-o", "--model-arg", action="append", default=[],
        help="model kwargs, e.g. -o variant=b0 -o convnext_depths=[1,1,2,1]",
    )
    args = ap.parse_args()
    if bool(args.bundle) == bool(args.checkpoint):
        ap.error("exactly one of --checkpoint or --bundle is required")
    _enable_tpu_compile_cache()

    from PIL import Image

    from dgtd_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD

    if args.bundle:
        _run_bundle(args, Image, IMAGENET_MEAN, IMAGENET_STD)
        return

    from dgtd_tpu.core.registry import MODELS
    from dgtd_tpu.train.hooks import load_variables_checkpoint

    from dgtd_tpu.core.config import _parse_value

    model_kwargs = {}
    for ov in args.model_arg:
        k, _, raw = ov.partition("=")
        model_kwargs[k.strip()] = _parse_value(raw.strip())
    model = MODELS.get(args.model)(
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16, **model_kwargs
    )
    variables = model.init(jax.random.PRNGKey(0), (1, args.size, args.size, 3))
    variables = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    }
    # full-tree graft: params AND BN running stats (params-only loading would
    # silently serve init statistics). Lenient here — partial checkpoints
    # (backbone pretrains) are a legitimate debugging input — but any missed
    # leaves are printed.
    variables, loaded, missed = load_variables_checkpoint(
        variables, args.checkpoint, strict=False
    )
    print(f"checkpoint: {len(loaded)} loaded / {len(missed)} missed")
    if missed:
        stats_missed = sum(k.startswith("batch_stats/") for k in missed)
        if stats_missed:
            print(
                f"  warning: {stats_missed} BN running-stat leaves left at init "
                "(outputs will differ from the training-time model)"
            )

    from dgtd_tpu.data.device_norm import normalize_image, scale_plane

    # device-norm routing is an exact no-op for float inputs, so one jitted
    # fn serves both ingest modes (jit re-specializes on dtype)
    predict = jax.jit(
        lambda v, im, d: model.predict(v, normalize_image(im), scale_plane(d))[0]
    )

    files = _list_images(args.image_dir)
    depth_files = _paired_depth_files(files, args.depth_dir)
    os.makedirs(args.out_dir, exist_ok=True)

    def load(path, mode, norm):
        with Image.open(path) as im:
            resized = im.convert(mode).resize((args.size, args.size), Image.BILINEAR)
            if args.uint8_io:
                arr = np.asarray(resized, np.uint8)
                return arr[..., None] if arr.ndim == 2 else arr
            arr = np.asarray(resized, np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        return (arr - IMAGENET_MEAN) / IMAGENET_STD if norm else arr

    def load_chunk(start):
        chunk = files[start : start + args.batch]
        imgs = np.stack([load(os.path.join(args.image_dir, f), "RGB", True) for f in chunk])
        if depth_files:
            deps = np.stack(
                [load(os.path.join(args.depth_dir, d), "L", False) for d in depth_files[start : start + args.batch]]
            )
        else:
            deps = np.zeros(imgs.shape[:3] + (1,), imgs.dtype)
        # pad the tail batch to the compiled shape
        pad = args.batch - len(chunk)
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
            deps = np.concatenate([deps, np.zeros((pad,) + deps.shape[1:], deps.dtype)])
        return chunk, imgs, deps

    def flush(chunk, probs_dev):
        probs = np.asarray(probs_dev)
        for f, prob in zip(chunk, probs):
            name = os.path.splitext(f)[0]
            Image.fromarray((np.clip(prob[..., 0], 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(args.out_dir, f"{name}_output.png")
            )

    # one-batch-deep pipeline: decode batch N+1 while the device runs batch
    # N, fetch N's output one dispatch behind (same shape as the loader's
    # prefetch and bench.py's eval pipeline — the sync per-batch loop left
    # the device idle during every decode+PNG-write)
    from concurrent.futures import ThreadPoolExecutor

    starts = list(range(0, len(files), args.batch))
    done = 0
    with ThreadPoolExecutor(max_workers=1) as pool:
        nxt = pool.submit(load_chunk, starts[0])
        pending = None
        for s in starts[1:] + [None]:
            chunk, imgs, deps = nxt.result()
            if s is not None:
                nxt = pool.submit(load_chunk, s)
            probs_dev = predict(variables, jnp.asarray(imgs), jnp.asarray(deps))
            if pending is not None:
                flush(*pending)
                done += len(pending[0])
                print(f"{done}/{len(files)}")
            pending = (chunk, probs_dev)
        flush(*pending)
        done += len(pending[0])
        print(f"{done}/{len(files)}")


from dgtd_tpu.utils.files import list_images as _list_images


def _paired_depth_files(files, depth_dir):
    """Sorted depth listing, validated 1:1 against the image listing — the
    same misalignment class FolderSODDataset._filter_files rejects. Depths
    pair by sorted index, so a count mismatch means silent mispairing."""
    if not depth_dir:
        return None
    depth_files = _list_images(depth_dir)
    if len(depth_files) != len(files):
        raise SystemExit(
            f"--depth-dir has {len(depth_files)} files but the image dir has "
            f"{len(files)} — depths pair to images by sorted order, so the "
            "counts must match exactly (e.g. one *_depth.png per image)"
        )
    return depth_files


def _run_bundle(args, Image, mean, std):
    """Folder inference through an exported AOT bundle: no model code, one
    image per call (bundles are exported at batch 1), native source sizes —
    the bundle loader buckets/resizes internally."""
    from dgtd_tpu.tools.export_serving import ServingModel

    serving = ServingModel.load(args.bundle)
    print(f"bundle: sizes {serving.sizes}, platforms {serving.meta.get('platforms')}")
    files = _list_images(args.image_dir)
    depth_files = _paired_depth_files(files, args.depth_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, f in enumerate(files):
        with Image.open(os.path.join(args.image_dir, f)) as im:
            rgb = np.asarray(im.convert("RGB"), np.float32) / 255.0
        img = ((rgb - mean) / std)[None]
        if depth_files:
            with Image.open(os.path.join(args.depth_dir, depth_files[i])) as dm:
                dep = np.asarray(
                    dm.convert("L").resize(im.size, Image.BILINEAR), np.float32
                )[None, ..., None] / 255.0
        else:
            dep = np.zeros(img.shape[:3] + (1,), np.float32)
        prob = serving(img, dep)
        name = os.path.splitext(f)[0]
        Image.fromarray((np.clip(prob[0, ..., 0], 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, f"{name}_output.png")
        )
        print(f"{i + 1}/{len(files)}")


if __name__ == "__main__":
    main()
