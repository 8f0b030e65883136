"""Layer-wise LR decay constructor (ViT-style).

Reference: ``LayerDecayOptimWrapperConstructor`` at
/root/reference/twig/optimizer/layer_decay.py:9-115 — per-layer multiplier
``decay_factor ** (num_layers - layer_id)`` where layer 0 is the patch embed,
transformer blocks count upward, and everything else gets layer ``num_layers``
(mult 1.0). Registered but commented out of both reference recipes
(config/cod.yml:57); provided here as the same opt-in surface: set
``optim_wrapper.constructor: LayerDecayOptimWrapperConstructor`` and
``optim_wrapper.paramwise_cfg.decay_factor`` in a recipe.
"""

from __future__ import annotations

from typing import Dict

from ..core.registry import OPTIM_CONSTRUCTORS, export
from ..models.pvt import PVT_V2_CONFIGS


def layer_decay_custom_keys(
    variant: str = "b2", decay_factor: float = 0.9, prefix: str = "hitnet/backbone"
) -> Dict[str, float]:
    """Per-path lr multipliers implementing layer decay over the PVT backbone.

    Layer ids: patch_embed1 = 0, then blocks in depth order, each stage's
    patch embed shares the id of its first block; the final norm / everything
    outside the backbone = num_layers (mult 1).
    """
    _, _, _, depths, _ = PVT_V2_CONFIGS[variant]
    num_layers = sum(depths) + 1
    keys: Dict[str, float] = {}
    keys[f"{prefix}/patch_embed1"] = decay_factor**num_layers
    layer = 1
    for s in range(4):
        if s > 0:
            keys[f"{prefix}/patch_embed{s + 1}"] = decay_factor ** (num_layers - layer)
        for i in range(depths[s]):
            keys[f"{prefix}/block{s + 1}_{i}"] = decay_factor ** (num_layers - layer)
            layer += 1
    return keys


@export
@OPTIM_CONSTRUCTORS.register(name="LayerDecayOptimWrapperConstructor")
def LayerDecayOptimWrapperConstructor(paramwise_cfg: dict, model_cfg: dict) -> Dict[str, float]:
    decay = float(paramwise_cfg.get("decay_factor", 0.9))
    variant = model_cfg.get("variant", "b2")
    return layer_decay_custom_keys(variant, decay)
