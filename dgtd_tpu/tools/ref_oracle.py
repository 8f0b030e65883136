"""Run the reference PyTorch model on CPU as a numerical oracle.

The reference (/root/reference/twig/model/cod.py) imports a stack of
training-infra packages (mmengine, nest, timm, segment_anything, torchcam,
torchvision, mmseg) of which only a handful of symbols are actually used by
the model's __init__/forward path. This module installs minimal stubs for
those symbols, shims the reference's hard-coded ``.cuda()`` calls
(cod.py:1259 allocates its FFT mask on CUDA even in a CPU run), and imports
the reference module from its file path.

Used by:
  * tests/test_torch_oracle.py — full-composition parity: reference
    ``Hitnet`` forward vs our converted-checkpoint ``cod.tensor`` forward;
  * tools/pin_torch_baseline.py — the honest PyTorch-CPU images/sec pin
    for bench.py's ``vs_baseline``.

This is test/bench tooling only; nothing in the compiled TPU path imports
torch.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import math
import os
import sys
import types
from typing import Any

REFERENCE_ROOT = os.environ.get("DGTD_REFERENCE_ROOT", "/root/reference")
REFERENCE_COD = os.path.join(REFERENCE_ROOT, "twig", "model", "cod.py")


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec probes (e.g. transformers'
    # optional-dependency checks) see a well-formed module
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


def install_stubs() -> None:
    """Register import stubs for the reference's unused heavy deps."""
    if "nest" in sys.modules and hasattr(sys.modules["nest"], "export"):
        return

    import torch
    import torch.nn as nn

    nest = _mod("nest")
    nest.export = lambda obj: obj  # @export is a registry decorator (no-op here)

    mmengine = _mod("mmengine")
    mm_model = _mod("mmengine.model")
    mm_model.BaseModel = nn.Module  # reference only uses super().__init__()
    mm_model.MMDistributedDataParallel = type("MMDistributedDataParallel", (), {})
    mm_hooks = _mod("mmengine.hooks")
    mm_hooks.Hook = object
    mm_eval = _mod("mmengine.evaluator")

    class BaseMetric:  # enough surface for twig/metric/*.py
        def __init__(self, collect_device="cpu", prefix=None, **kwargs):
            self.collect_device = collect_device
            self.prefix = prefix
            self.results = []

    mm_eval.BaseMetric = BaseMetric
    mmengine.model = mm_model
    mmengine.hooks = mm_hooks
    mmengine.evaluator = mm_eval

    timm = _mod("timm")
    timm_models = _mod("timm.models")
    timm_resnet = _mod("timm.models.resnet")
    timm_resnet.Bottleneck = object  # imported, never instantiated

    timm_layers = _mod("timm.models.layers")

    class DropPath(nn.Module):
        """Per-sample stochastic depth (timm semantics); identity in eval."""

        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype, device=x.device))
            return x / keep * mask

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std + mean, max=b * std + mean)
        return tensor

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_

    timm_registry = _mod("timm.models.registry")
    timm_registry.register_model = lambda fn: fn
    timm_vit = _mod("timm.models.vision_transformer")
    timm_vit._cfg = lambda url="", **kwargs: {"url": url, **kwargs}

    timm.models = timm_models
    timm.create_model = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("timm.create_model stub: not used by the oracle path")
    )
    timm_models.resnet = timm_resnet
    timm_models.layers = timm_layers
    timm_models.registry = timm_registry
    timm_models.vision_transformer = timm_vit

    sam = _mod("segment_anything")
    sam.sam_model_registry = {}
    sam_utils = _mod("segment_anything.utils")
    sam_transforms = _mod("segment_anything.utils.transforms")
    sam_transforms.ResizeLongestSide = object
    sam.utils = sam_utils
    sam_utils.transforms = sam_transforms

    torchcam = _mod("torchcam")
    torchcam_methods = _mod("torchcam.methods")
    torchcam_methods.CAM = object
    torchcam.methods = torchcam_methods

    torchvision = _mod("torchvision")
    tv_transforms = _mod("torchvision.transforms")
    tv_utils = _mod("torchvision.utils")
    tv_utils.save_image = lambda *a, **k: None
    torchvision.transforms = tv_transforms
    torchvision.utils = tv_utils

    _mod("mmseg")

    # CPU shim: the reference hard-codes .cuda() inside its forward
    # (cod.py:1259, :206-207); keep tensors where they are.
    torch.Tensor.cuda = lambda self, *a, **k: self


_ref_module = None


def load_reference_cod() -> Any:
    """Import /root/reference/twig/model/cod.py with stubs installed."""
    global _ref_module
    if _ref_module is not None:
        return _ref_module
    if not os.path.exists(REFERENCE_COD):
        raise FileNotFoundError(REFERENCE_COD)
    install_stubs()
    spec = importlib.util.spec_from_file_location("dgtd_reference_cod", REFERENCE_COD)
    module = importlib.util.module_from_spec(spec)
    sys.modules["dgtd_reference_cod"] = module
    spec.loader.exec_module(module)
    _ref_module = module
    return module


def reference_available() -> bool:
    return os.path.exists(REFERENCE_COD)


_loaded_modules = {}


def load_reference_module(relpath: str) -> Any:
    """Import any reference .py file (path relative to the reference root)
    with the stubs installed — e.g. ``twig/metric/mIOU.py`` for the metric
    oracles."""
    if relpath in _loaded_modules:
        return _loaded_modules[relpath]
    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    install_stubs()
    name = "dgtd_reference_" + relpath.replace("/", "_").removesuffix(".py")
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    _loaded_modules[relpath] = module
    return module
