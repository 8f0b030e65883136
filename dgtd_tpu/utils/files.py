"""Shared host-side file-listing helpers (single source for the CLIs)."""

from __future__ import annotations

import os
from typing import List

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp")


def list_images(d: str, required: bool = True) -> List[str]:
    """Sorted image filenames in ``d`` — image extensions only, so a stray
    non-image entry (.DS_Store, a subdirectory) can neither crash Image.open
    nor shift sorted-order pairing. One definition serves predict.py,
    eval_folder and metric_parity (they drifted when each carried a copy)."""
    files = sorted(f for f in os.listdir(d) if f.lower().endswith(IMAGE_EXTS))
    if required and not files:
        raise SystemExit(f"no image files in {d}")
    return files
