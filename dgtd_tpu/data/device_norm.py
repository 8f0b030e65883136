"""Device-side input normalization (uint8 ingest).

The reference normalizes on the host inside torchvision transforms
(cod10k_camo_train.py:32-38) and ships float32 to a co-located GPU. On TPU
the idiomatic split is the opposite: ship the post-resize uint8 bytes and do
``(x/255 - mean)/std`` inside the jitted step, where XLA fuses it into the
first convolution. That cuts host->device traffic 4x (decisive when the
device is remote/tunneled, still free bandwidth on PCIe hosts) and removes
the float conversion from the 1-core host's critical path.

Enabled per-dataset with ``uint8_io: true`` (datasets.py); every jitted
entry point (train step, eval steps, val stats step) routes its inputs
through :func:`normalize_image` / :func:`scale_plane`, which are exact
no-ops for float inputs — jit re-specializes on dtype, so the float path
compiles to byte-identical programs as before.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB -> ImageNet-normalized float32; float input passes through
    (already normalized on host)."""
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return x


def scale_plane(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 single-channel plane (depth/label) -> float32 in [0, 1]."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def normalize_batch(batch):
    """Normalize a train/val batch dict in place of host normalization.

    ``input`` gets the ImageNet transform; ``depth``/``label`` scale to
    [0, 1]; other keys (e.g. host-side ``raw``) pass through untouched.
    """
    out = dict(batch)
    if "input" in out:
        out["input"] = normalize_image(out["input"])
    for k in ("depth", "label"):
        if k in out and getattr(out[k], "dtype", None) == jnp.uint8:
            out[k] = scale_plane(out[k])
    return out
