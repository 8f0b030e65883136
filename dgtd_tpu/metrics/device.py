"""On-device metric statistics.

The SOD metric suite's only O(H·W) work is per-image reductions: the two
256-bin threshold histograms (F/E-measure curves), the MAE sum, and the
min/max used by py_sod_metrics' mapminmax normalization. This module computes
them in one jitted pass over a batch so the host-side evaluators only do
O(256) curve math per image (SURVEY.md §5 metrics plan) — on a remote-TPU
setup this also shrinks the device->host transfer from full probability maps
to a few KB per image.

Quantization parity: py_sod_metrics binarizes gt at >128 after uint8
conversion and histograms ``(pred*255).astype(uint8)`` of the mapminmax'd
pred; this reproduces exactly that arithmetic in fp32/int32.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def batch_statistics(prob: jnp.ndarray, label: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """prob/label: (B, H, W) or (B, H, W, 1) floats in [0, 1].

    Returns per-image stats: fg_hist/bg_hist (B, 256), gt_count (B,),
    mae_sum (B,), n_pixels (scalar).
    """
    if prob.ndim == 4:
        prob = prob[..., 0]
        label = label[..., 0]
    b = prob.shape[0]
    n = prob.shape[1] * prob.shape[2]

    # uint8 conversion parity: pred_u8 = floor(prob*255); gt bool = u8 > 128
    pred_u8 = jnp.floor(prob.astype(jnp.float32) * 255.0).astype(jnp.int32)
    pred_u8 = jnp.clip(pred_u8, 0, 255)
    gt_u8 = jnp.floor(label.astype(jnp.float32) * 255.0).astype(jnp.int32)
    gt = gt_u8 > 128

    # mapminmax over pred/255 then requantize to uint8 bins
    p = pred_u8.astype(jnp.float32) / 255.0
    pmin = jnp.min(p, axis=(1, 2), keepdims=True)
    pmax = jnp.max(p, axis=(1, 2), keepdims=True)
    span = jnp.where(pmax > pmin, pmax - pmin, 1.0)
    p_norm = jnp.where(pmax > pmin, (p - pmin) / span, p)
    q = jnp.clip((p_norm * 255.0).astype(jnp.int32), 0, 255)

    # per-image fg/bg histograms via one-hot matmul (MXU-friendly bincount)
    onehot = jax.nn.one_hot(q.reshape(b, n), 256, dtype=jnp.float32)  # (B, N, 256)
    gt_flat = gt.reshape(b, n).astype(jnp.float32)
    fg_hist = jnp.einsum("bn,bnk->bk", gt_flat, onehot)
    bg_hist = jnp.einsum("bn,bnk->bk", 1.0 - gt_flat, onehot)

    mae_sum = jnp.sum(jnp.abs(p_norm - gt_flat.reshape(p_norm.shape)), axis=(1, 2))
    return {
        "fg_hist": fg_hist,
        "bg_hist": bg_hist,
        "gt_count": jnp.sum(gt_flat, axis=1),
        "mae_sum": mae_sum,
        "n_pixels": jnp.full((b,), n, jnp.int32),
    }
