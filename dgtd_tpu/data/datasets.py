"""RGB-D segmentation dataset loaders.

Re-implements the reference's 7 loaders (/root/reference/twig/dataset/, one
class per benchmark) with identical registry names, directory conventions,
ordering (sorted listings), the COD10K test-partition slice ``[3381:]``
(cod10k_test.py:24-26), the image/GT-size ``filter_files`` screen, and the
same per-item dict ``{'raw','input','label','depth'}``.

Differences by design (TPU-first):
  * samples come back as numpy HWC float32 (NHWC batches), not CHW tensors;
  * the train-time paired random horizontal flip uses a per-index
    ``np.random.Generator`` stream instead of the reference's shared-seed
    re-seeding trick (cod10k_camo_train.py:66-78) — same distribution,
    deterministic given (seed, epoch, index);
  * decode/resize happen host-side with PIL (bilinear, matching torchvision's
    PIL path); normalization can optionally be deferred to the device where it
    fuses into the first conv (see data/loader.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image

from ..core.registry import DATASETS, export
from .device_norm import IMAGENET_MEAN, IMAGENET_STD


def _list_dir(root: str, sub: str) -> List[str]:
    d = os.path.join(root, sub)
    return [os.path.join(d, f) for f in os.listdir(d)]


class FolderSODDataset:
    """One parameterized loader behind all 7 registered dataset classes."""

    image_subdir = "Imgs"
    gt_subdir = "GT"
    size = 384
    train_mode = False
    nested = ()  # path components between data_dir and the subdirs (NC4K: ('train',))
    skip_first = 0  # COD10K test partition slice
    raw_as_path = False

    def __init__(
        self,
        data_dir: str,
        depth_dir: str,
        split: str,
        image_size: Optional[Union[tuple, list]] = None,
        filter_size_mismatch: bool = True,
        pipeline: str = "pil",
        uint8_io: bool = False,
    ):
        #: "native" routes post-decode work (resize+normalize+flip) through the
        #: fused C++ pipeline (dgtd_tpu/native/pixelops.cpp) — half-pixel
        #: bilinear, matching torch interpolate; "pil" (default) keeps PIL's
        #: antialiased resample like the reference's torchvision transforms.
        self.pipeline = pipeline
        #: ship post-resize uint8 to the device and normalize there (jitted
        #: steps route inputs through data/device_norm.py — 4x less
        #: host->device traffic; exact no-op for float pipelines).
        self.uint8_io = bool(uint8_io)
        if pipeline == "native":
            from ..native import pixelops

            if not pixelops.available():
                self.pipeline = "pil"
        self._check_split(split)
        base = os.path.join(data_dir, *self.nested)
        self.images = sorted(_list_dir(base, self.image_subdir))[self.skip_first :]
        self.gts = sorted(_list_dir(base, self.gt_subdir))[self.skip_first :]
        self.depths = sorted(_list_dir(base, depth_dir))[self.skip_first :]
        if filter_size_mismatch:
            self._filter_files()
        if image_size is not None:
            self.size = int(image_size[0]) if isinstance(image_size, (tuple, list)) else int(image_size)

    def _check_split(self, split: str) -> None:
        if split not in ("train", "test", "val"):
            raise NotImplementedError(f"Unsupported split {split}")
        if self.train_mode and split != "train":
            raise ValueError(f"{type(self).__name__} is a training split")
        if not self.train_mode and split == "train":
            raise ValueError(f"{type(self).__name__} is an eval split")

    def _filter_files(self) -> None:
        assert len(self.images) == len(self.gts), (len(self.images), len(self.gts))
        if len(self.depths) != len(self.images):
            # sorted-order pairing (the reference convention) is only valid
            # one-to-one; a partial depth dir would silently pair image i
            # with the wrong depth map once anything is filtered
            raise ValueError(
                f"{type(self).__name__}: depth dir has {len(self.depths)} files "
                f"for {len(self.images)} images — depth maps must pair 1:1 "
                "(regenerate with tools/depth_gen.py)"
            )
        keep_img, keep_gt, keep_d = [], [], []
        for img_path, gt_path, d_path in zip(self.images, self.gts, self.depths):
            with Image.open(img_path) as img, Image.open(gt_path) as gt:
                if img.size == gt.size:
                    keep_img.append(img_path)
                    keep_gt.append(gt_path)
                    keep_d.append(d_path)
        self.images, self.gts, self.depths = keep_img, keep_gt, keep_d

    def __len__(self) -> int:
        return len(self.images)

    def _load_resized(self, path: str, mode: str) -> np.ndarray:
        with Image.open(path) as im:
            im = im.convert(mode)
            im = im.resize((self.size, self.size), Image.BILINEAR)
            arr = np.asarray(im, np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr

    def _decode(self, path: str, mode: str) -> np.ndarray:
        with Image.open(path) as im:
            return np.asarray(im.convert(mode), np.uint8)

    def get(self, index: int, rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
        flip = bool(self.train_mode and rng is not None and rng.random() < 0.5)
        size = (self.size, self.size)
        if self.uint8_io:
            return self._get_uint8(index, size, flip)
        if self.pipeline == "native":
            from ..native import pixelops

            img_u8 = self._decode(self.images[index], "RGB")
            inp = pixelops.resize_normalize(img_u8, size, IMAGENET_MEAN, IMAGENET_STD, flip)
            label = pixelops.resize_normalize(self._decode(self.gts[index], "L"), size, flip=flip)
            depth = pixelops.resize_normalize(self._decode(self.depths[index], "L"), size, flip=flip)
            # reference contract: raw is the resized UNNORMALIZED image,
            # FLIPPED in lockstep with input — train raw_transform includes
            # RandomHorizontalFlip under the same re-seeded rng
            # (cod10k_camo_train.py:47-50,75); test datasets never flip
            raw = (
                self.images[index]
                if self.raw_as_path
                else pixelops.resize_normalize(img_u8, size, flip=flip)
            )
            return {"raw": raw, "input": inp, "label": label, "depth": depth}

        image = self._load_resized(self.images[index], "RGB")
        label = self._load_resized(self.gts[index], "L")
        depth = self._load_resized(self.depths[index], "L")
        if flip:
            image = image[:, ::-1].copy()
            label = label[:, ::-1].copy()
            depth = depth[:, ::-1].copy()
        # raw flips in lockstep with input (see the native-path note above)
        raw = self.images[index] if self.raw_as_path else image
        return {
            "raw": raw,
            "input": (image - IMAGENET_MEAN) / IMAGENET_STD,
            "label": label,
            "depth": depth,
        }

    def _get_uint8(self, index: int, size, flip: bool) -> Dict[str, np.ndarray]:
        """uint8-ingest path: resized (optionally flipped) uint8 HWC arrays;
        normalization happens inside the jitted step (data/device_norm.py).
        ``raw`` keeps its reference contract (path, or the resized image
        flipped in lockstep with input — as uint8 here; the visualizer
        handles both dtypes)."""
        if self.pipeline == "native":
            from ..native import pixelops

            resize = lambda u8, f: pixelops.resize_u8(u8, size, f)
        else:

            def resize(u8, f):
                arr = np.asarray(
                    Image.fromarray(u8.squeeze(-1) if u8.ndim == 3 and u8.shape[-1] == 1 else u8)
                    .resize((size[1], size[0]), Image.BILINEAR),
                    np.uint8,
                )
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                return arr[:, ::-1].copy() if f else arr

        img_u8 = self._decode(self.images[index], "RGB")
        inp = resize(img_u8, flip)
        label = resize(self._decode(self.gts[index], "L")[..., None], flip)
        depth = resize(self._decode(self.depths[index], "L")[..., None], flip)
        # raw flips in lockstep with input — which is exactly ``inp`` here
        # (the resized, flipped, unnormalized uint8 image)
        raw = self.images[index] if self.raw_as_path else inp
        return {"raw": raw, "input": inp, "label": label, "depth": depth}

    # torch-style convenience (no augmentation rng)
    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return self.get(index, None)


@export
@DATASETS.register
class COD10K_CAMO_TRAIN(FolderSODDataset):
    """COD train (COD10K+CAMO), 384², paired flips (cod10k_camo_train.py:12).

    ``raw`` = resized unnormalized image, flipped in lockstep with input —
    the reference raw_transform includes RandomHorizontalFlip under the
    shared re-seeded rng (cod10k_camo_train.py:47-50,75)."""

    image_subdir = "Imgs"
    train_mode = True
    raw_as_path = False


@export
@DATASETS.register
class COD10K_TEST(FolderSODDataset):
    """COD10K test split: sorted[3381:], 384², raw=path (cod10k_test.py:53)."""

    image_subdir = "Image"
    skip_first = 3381
    raw_as_path = True


@export
@DATASETS.register
class COD_TEST(FolderSODDataset):
    """CAMO test, 704² (camo_test.py:10); ``raw`` = resized image (camo_test.py:44-47)."""

    image_subdir = "Image"
    size = 704
    raw_as_path = False


@export
@DATASETS.register
class CHAMELEON(FolderSODDataset):
    """CHAMELEON test, 704² (chameleon.py); ``raw`` = resized image (chameleon.py:44-47)."""

    image_subdir = "Image"
    size = 704
    raw_as_path = False


@export
@DATASETS.register
class NC4K(FolderSODDataset):
    """NC4K test, 704², nested under train/ (nc4k.py); ``raw`` = resized image (nc4k.py:42-45)."""

    image_subdir = "Image"
    size = 704
    nested = ("train",)
    raw_as_path = False


@export
@DATASETS.register
class SOD_TRAIN(FolderSODDataset):
    """RGB-D SOD train, RGB/ image dir, 384² (sod_train.py:12).

    ``raw`` = resized image, flipped in lockstep with input/label (the
    re-seeded raw_transform includes RandomHorizontalFlip, sod_train.py:46-50,
    74)."""

    image_subdir = "RGB"
    train_mode = True
    raw_as_path = False


@export
@DATASETS.register
class SOD_TEST(FolderSODDataset):
    """RGB-D SOD test (NJU2K per config/sod.yml:32), 384²; raw=path (sod_test.py:52)."""

    image_subdir = "RGB"
    raw_as_path = True


@export
@DATASETS.register
class SyntheticSODDataset:
    """In-memory synthetic RGB-D fixture for tests and benchmarks.

    Geometric blobs with correlated depth so train/eval smoke paths exercise
    real signal (SURVEY.md §4(e): end-to-end smoke on a tiny synthetic
    RGB-D dataset fixture).
    """

    train_mode = True

    def __init__(self, n: int = 8, size: int = 96, seed: int = 0, uint8_io: bool = False):
        self.size = size
        #: ship uint8, normalize on device (same contract as FolderSODDataset)
        self.uint8_io = bool(uint8_io)
        rng = np.random.default_rng(seed)
        self._items = []
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        for _ in range(n):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            r = rng.uniform(0.12, 0.3)
            mask = (((xx - cx) ** 2 + (yy - cy) ** 2) < r**2).astype(np.float32)
            tex = rng.normal(0, 0.08, (size, size, 3)).astype(np.float32)
            image = np.clip(0.35 + 0.4 * mask[..., None] + tex, 0, 1)
            depth = np.clip(0.3 + 0.5 * mask + rng.normal(0, 0.03, (size, size)), 0, 1)
            self._items.append((image.astype(np.float32), mask[..., None], depth[..., None].astype(np.float32)))

    def __len__(self):
        return len(self._items)

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        image, label, depth = self._items[index]
        if rng is not None and rng.random() < 0.5:
            image, label, depth = image[:, ::-1].copy(), label[:, ::-1].copy(), depth[:, ::-1].copy()
        if self.uint8_io:
            u8 = lambda a: np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
            return {"raw": image, "input": u8(image), "label": u8(label), "depth": u8(depth)}
        return {
            "raw": image,
            "input": (image - IMAGENET_MEAN) / IMAGENET_STD,
            "label": label,
            "depth": depth,
        }

    __getitem__ = get
