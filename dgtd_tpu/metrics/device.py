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


EPS = float(np.spacing(1))


def _s_object_part(p: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """2x/(x²+1+σ) over masked pixels, MATLAB std (ddof=1)."""
    cnt = jnp.sum(mask)
    x = jnp.sum(p * mask) / jnp.maximum(cnt, 1.0)
    var = jnp.sum(((p - x) * mask) ** 2) / jnp.maximum(cnt - 1.0, 1.0)
    sigma = jnp.sqrt(var)
    score = 2.0 * x / (x**2 + 1.0 + sigma + EPS)
    return jnp.where(cnt > 0, score, 0.0)


def _region_ssim(p: jnp.ndarray, g: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Fan's per-quadrant SSIM with (N-1) normalization, masked form."""
    n = jnp.sum(mask)
    n_safe = jnp.maximum(n, 1.0)
    x = jnp.sum(p * mask) / n_safe
    y = jnp.sum(g * mask) / n_safe
    denom = jnp.maximum(n - 1.0, 1.0)
    sigma_x = jnp.sum(((p - x) * mask) ** 2) / denom
    sigma_y = jnp.sum(((g - y) * mask) ** 2) / denom
    sigma_xy = jnp.sum((p - x) * (g - y) * mask**2) / denom
    alpha = 4.0 * x * y * sigma_xy
    beta = (x**2 + y**2) * (sigma_x + sigma_y)
    return jnp.where(alpha != 0, alpha / (beta + EPS), jnp.where(beta == 0, 1.0, 0.0))


def _smeasure_single(p: jnp.ndarray, gt: jnp.ndarray, alpha: float = 0.5) -> jnp.ndarray:
    """Device S-measure for one (H, W) image (py_sod_metrics semantics)."""
    h, w = p.shape
    gtf = gt.astype(jnp.float32)
    y = jnp.mean(gtf)

    # ---- object score ----
    obj = y * _s_object_part(p * gtf, gtf) + (1.0 - y) * _s_object_part(
        (1.0 - p) * (1.0 - gtf), 1.0 - gtf
    )

    # ---- region score: centroid (MATLAB round-half-even) + quadrants ----
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cnt = jnp.sum(gtf)
    ys = jnp.sum(rows * gtf) / jnp.maximum(cnt, 1.0)
    xs = jnp.sum(cols * gtf) / jnp.maximum(cnt, 1.0)
    cy = jnp.where(cnt > 0, jnp.round(ys), jnp.round(h / 2.0)) + 1.0
    cx = jnp.where(cnt > 0, jnp.round(xs), jnp.round(w / 2.0)) + 1.0

    top = rows < cy
    left = cols < cx
    area = float(h * w)
    region = jnp.float32(0.0)
    quadrant_weights = []
    for qy, qx in ((1, 1), (1, 0), (0, 1), (0, 0)):
        mask = ((top if qy else ~top) & (left if qx else ~left)).astype(jnp.float32)
        quadrant_weights.append(jnp.sum(mask) / area)
    # w4 = 1 - w1 - w2 - w3 (py_sod convention, equals area residual)
    quadrant_weights[3] = 1.0 - quadrant_weights[0] - quadrant_weights[1] - quadrant_weights[2]
    for (qy, qx), wq in zip(((1, 1), (1, 0), (0, 1), (0, 0)), quadrant_weights):
        mask = ((top if qy else ~top) & (left if qx else ~left)).astype(jnp.float32)
        region = region + wq * _region_ssim(p, gtf, mask)

    sm = jnp.maximum(alpha * obj + (1 - alpha) * region, 0.0)
    sm = jnp.where(y == 0, 1.0 - jnp.mean(p), jnp.where(y == 1, jnp.mean(p), sm))
    return sm


#: pixels per histogram block: the scan body materializes one
#: (B, _HIST_CHUNK, 256) fp32 one-hot (16 MB at B=4) instead of (B, N, 256)
_HIST_CHUNK = 16384


def _chunked_histograms(q: jnp.ndarray, fg_w: jnp.ndarray):
    """Per-image 256-bin fg/bg histograms of ``q`` (B, N) int32 bins with
    foreground weights ``fg_w`` (B, N) in {0,1}; returns two (B, 256) f32."""
    b, n = q.shape
    pad = (-n) % _HIST_CHUNK
    valid = jnp.pad(jnp.ones((b, n), jnp.float32), ((0, 0), (0, pad)))
    q = jnp.pad(q, ((0, 0), (0, pad)))
    fg_w = jnp.pad(fg_w, ((0, 0), (0, pad)))
    nc = q.shape[1] // _HIST_CHUNK
    chunks = (
        q.reshape(b, nc, _HIST_CHUNK).transpose(1, 0, 2),
        fg_w.reshape(b, nc, _HIST_CHUNK).transpose(1, 0, 2),
        valid.reshape(b, nc, _HIST_CHUNK).transpose(1, 0, 2),
    )

    def step(carry, xs):
        fg, bg = carry
        qi, fgi, vi = xs
        onehot = jax.nn.one_hot(qi, 256, dtype=jnp.float32)
        fg = fg + jnp.einsum("bn,bnk->bk", fgi, onehot)
        bg = bg + jnp.einsum("bn,bnk->bk", vi - fgi, onehot)
        return (fg, bg), None

    zeros = jnp.zeros((b, 256), jnp.float32)
    (fg_hist, bg_hist), _ = jax.lax.scan(step, (zeros, zeros), chunks)
    return fg_hist, bg_hist


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

    # per-image fg/bg histograms via one-hot matmul (MXU-friendly bincount),
    # chunked with lax.scan so the one-hot materialization is bounded at
    # (B, _HIST_CHUNK, 256) fp32 regardless of resolution — batched 704²/1024²
    # val stays well under the VMEM/HBM cliff the unchunked (B, N, 256)
    # version hit (~0.5 GB per 704² image).
    gt_flat = gt.reshape(b, n).astype(jnp.float32)
    fg_hist, bg_hist = _chunked_histograms(q.reshape(b, n), gt_flat)

    mae_sum = jnp.sum(jnp.abs(p_norm - gt_flat.reshape(p_norm.shape)), axis=(1, 2))
    sm = jax.vmap(_smeasure_single)(p_norm, gt)
    return {
        "fg_hist": fg_hist,
        "bg_hist": bg_hist,
        "gt_count": jnp.sum(gt_flat, axis=1),
        "mae_sum": mae_sum,
        "sm": sm,
        "n_pixels": jnp.full((b,), n, jnp.int32),
    }
