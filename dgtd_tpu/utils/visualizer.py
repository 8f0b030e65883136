"""Visualization backends (observability layer).

Reference surface: MMEngine's ``visualizer.vis_backends`` with the optional
``ClearMLVisBackend`` (/root/reference/config/base/visualization/clearml.yml:1-7,
commented out of both recipes). Here the same config shape resolves to local
backends: ``LocalVisBackend`` writes PNGs + a scalars JSONL under the work
dir; ``ClearMLVisBackend`` is accepted for recipe parity and degrades to the
local backend when the clearml package is absent (zero-egress environments).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from ..core.registry import HOOKS, Registry, export

VIS_BACKENDS = Registry("vis_backends")


@export
@VIS_BACKENDS.register
class LocalVisBackend:
    def __init__(self, save_dir: str = "./output/vis", project: Optional[str] = None):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self._scalar_path = os.path.join(save_dir, "scalars.jsonl")

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        # open-per-write: backends live as long as the Runner and have no
        # close() contract — a held handle would leak one fd per Runner
        # (sweeps, tests) and risk losing the last buffered record
        with open(self._scalar_path, "a") as f:
            f.write(json.dumps({"step": step, **scalars}) + "\n")

    def add_image(self, name: str, image: np.ndarray, step: int = 0) -> None:
        from PIL import Image

        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        Image.fromarray(arr).save(os.path.join(self.save_dir, f"{name}_{step}.png"))


@export
@VIS_BACKENDS.register
class ClearMLVisBackend(LocalVisBackend):
    """Recipe-parity name; uses clearml when importable, else local files."""

    def __init__(self, save_dir: str = "./output/vis", project: str = "COD", **kwargs):
        super().__init__(save_dir=save_dir)
        self._task = None
        try:  # pragma: no cover - clearml not in this image
            from clearml import Task

            self._task = Task.init(project_name=project, task_name="dgtd_tpu")
        except Exception:
            pass

    def add_scalars(self, scalars, step):
        super().add_scalars(scalars, step)
        if self._task:  # pragma: no cover
            for k, v in scalars.items():
                self._task.get_logger().report_scalar("train", k, v, step)


def build_visualizer(cfg: Optional[dict], work_dir: str):
    """Build backends from a reference-schema ``visualizer`` block."""
    if not cfg:
        return []
    backends = []
    for b in cfg.get("vis_backends", []) or []:
        b = dict(b)
        b.setdefault("save_dir", os.path.join(work_dir, "vis"))
        backends.append(VIS_BACKENDS.build(b))
    return backends
