"""Losses: structure-weighted BCE+IoU and SSIM texture alignment.

Reference: ``cal_loss`` at /root/reference/twig/model/cod.py:76-85 (pixel
weight ``1 + 5*|avgpool31(gt) - gt|``, weighted BCE-with-logits + weighted
IoU), stage weighting at cod.py:137-145 (iteration i weighted ``0.2*i`` —
iteration 0 contributes nothing, replicated for parity), and the 3x3
reflection-padded SSIM at cod.py:316-351 (computes an 0.85/0.15 SSIM+L1
blend but returns only the SSIM term — replicated).

All reductions are computed in float32 regardless of the model compute dtype.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import optax

from ..utils.image import avg_pool, normalize_01, reflect_pad


def structure_loss(logits: jnp.ndarray, gts: jnp.ndarray) -> jnp.ndarray:
    """Structure-weighted BCE + IoU. NHWC (B, H, W, 1) logits/targets."""
    logits = logits.astype(jnp.float32)
    gts = gts.astype(jnp.float32)
    weit = 1.0 + 5.0 * jnp.abs(avg_pool(gts, 31, 1, 15) - gts)
    bce = optax.sigmoid_binary_cross_entropy(logits, gts)
    wbce = jnp.sum(weit * bce, axis=(1, 2)) / jnp.sum(weit, axis=(1, 2))

    preds = jax.nn.sigmoid(logits)
    inter = jnp.sum(preds * gts * weit, axis=(1, 2))
    union = jnp.sum((preds + gts) * weit, axis=(1, 2))
    wiou = 1.0 - (inter + 1.0) / (union - inter + 1.0)
    return jnp.mean(wbce + wiou)


def ssim_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """3x3 avg-pool SSIM with reflection padding; returns mean((1-SSIM)/2 clamped)."""
    x = reflect_pad(x.astype(jnp.float32), 1)
    y = reflect_pad(y.astype(jnp.float32), 1)
    c1, c2 = 0.01**2, 0.03**2
    mu_x = avg_pool(x, 3, 1)
    mu_y = avg_pool(y, 3, 1)
    sigma_x = avg_pool(x * x, 3, 1) - mu_x * mu_x
    sigma_y = avg_pool(y * y, 3, 1) - mu_y * mu_y
    sigma_xy = avg_pool(x * y, 3, 1) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0))


def staged_losses(
    stage_logits: Sequence[jnp.ndarray],
    pred2_logits: jnp.ndarray,
    label: jnp.ndarray,
    gamma: float = 0.2,
) -> jnp.ndarray:
    """``sum_i (gamma*i) * L(P1[i]) + L(P2)`` (cod.py:137-142)."""
    total = jnp.float32(0.0)
    for i, logit in enumerate(stage_logits):
        if i == 0:
            continue  # reference weights iteration 0 by 0.0 (cod.py:140-141)
        total = total + (gamma * i) * structure_loss(logit, label)
    return total + structure_loss(pred2_logits, label)


def texture_ssim_loss(texture: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """SSIM between the min-max-normalized texture map and the input image
    (cod.py:143-145). NOTE (replicated reference quirk): the texture map is a
    pure function of the input (FFT high-pass), so this term carries no
    parameter gradient — it is a constant observability term in the loss."""
    return ssim_loss(normalize_01(texture), image)
