"""Windowed cross-attention fusion modules (DQnet lineage surface).

Reference: ``WindowFusion`` / ``new_WindowFusion`` + ``window_partition`` /
``window_reverse`` / ``calc_rel_pos_spatial`` at
/root/reference/twig/model/cod.py:1549-1761 — defined in every model file but
not called in the main cod forward (SURVEY.md §2.2); part of the public
surface, used by the DQnet lineage's commented cross-attention path.

NHWC-native: window partition is a reshape/transpose (free under XLA), the
windowed attention batches all windows into one MXU matmul, and the MViT-style
decomposed relative position bias is two einsums.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import Dense

Dtype = Any


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nWin, win, win, C). H, W divisible by win."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)


def window_reverse(windows: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    b = windows.shape[0] // ((h // win) * (w // win))
    x = windows.reshape(b, h // win, w // win, win, win, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def rel_pos_spatial_bias(q: jnp.ndarray, q_shape, k_shape, rel_pos_h, rel_pos_w):
    """MViT decomposed relative position bias (cod.py:1725-1761).

    q: (B, heads, q_h*q_w, dim). Returns bias (B, heads, q_h*q_w, k_h*k_w)."""
    q_h, q_w = q_shape
    k_h, k_w = k_shape
    q_h_ratio = max(k_h / q_h, 1.0)
    k_h_ratio = max(q_h / k_h, 1.0)
    dist_h = (
        np.arange(q_h)[:, None] * q_h_ratio - np.arange(k_h)[None, :] * k_h_ratio
    ) + (k_h - 1) * k_h_ratio
    q_w_ratio = max(k_w / q_w, 1.0)
    k_w_ratio = max(q_w / k_w, 1.0)
    dist_w = (
        np.arange(q_w)[:, None] * q_w_ratio - np.arange(k_w)[None, :] * k_w_ratio
    ) + (k_w - 1) * k_w_ratio
    rh = rel_pos_h[jnp.asarray(dist_h.astype(np.int32))]  # (q_h, k_h, dim)
    rw = rel_pos_w[jnp.asarray(dist_w.astype(np.int32))]  # (q_w, k_w, dim)
    b, heads, qn, dim = q.shape
    r_q = q.reshape(b, heads, q_h, q_w, dim)
    rel_h = jnp.einsum("byhwc,hkc->byhwk", r_q, rh)
    rel_w = jnp.einsum("byhwc,wkc->byhwk", r_q, rw)
    bias = rel_h[:, :, :, :, :, None] + rel_w[:, :, :, :, None, :]
    return bias.reshape(b, heads, q_h * q_w, k_h * k_w)


class WindowFusion(nn.Module):
    """Windowed cross-attention with relative position bias (cod.py:1584-1683).

    x provides queries, y provides keys/values; returns
    ``(attended * y + y, sigmoid(attended))`` on NHWC maps."""

    window: int = 10
    num_heads: int = 8
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        b, h, w, c = x.shape
        win = self.window
        hd = c // self.num_heads
        scale = hd**-0.5
        pad_b = (win - h % win) % win
        pad_r = (win - w % win) % win
        xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        yp = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        xw = window_partition(xp, win).reshape(-1, win * win, c)
        yw = window_partition(yp, win).reshape(-1, win * win, c)
        bw, n = xw.shape[0], win * win

        rel_dim = 2 * win - 1
        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros, (rel_dim, hd), jnp.float32)
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros, (rel_dim, hd), jnp.float32)

        q = Dense(c, use_bias=self.qkv_bias, init_scheme="trunc", dtype=self.dtype, name="q")(xw)
        kv = Dense(2 * c, use_bias=self.qkv_bias, init_scheme="trunc", dtype=self.dtype, name="kv")(yw)
        q = q.reshape(bw, n, self.num_heads, hd).transpose(0, 2, 1, 3) * scale
        kv = kv.reshape(bw, n, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        attn = attn + rel_pos_spatial_bias(q, (win, win), (win, win), rel_pos_h, rel_pos_w)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        out = Dense(c, init_scheme="trunc", dtype=self.dtype, name="proj")(out)
        out = window_reverse(out.reshape(-1, win, win, c), win, hp, wp)[:, :h, :w]
        return out * y + y, nn.sigmoid(out)


class NewWindowFusion(nn.Module):
    """Global (un-windowed) cross-attention fusion (cod.py:1549-1582):
    qk from x, v from y, residual ``attended + x + y``."""

    num_heads: int = 8
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        b, h, w, c = x.shape
        n = h * w
        hd = c // self.num_heads
        scale = hd**-0.5
        xt = x.reshape(b, n, c)
        yt = y.reshape(b, n, c)
        qk = Dense(2 * c, use_bias=self.qkv_bias, init_scheme="trunc", dtype=self.dtype, name="qk")(xt)
        v = Dense(c, use_bias=self.qkv_bias, init_scheme="trunc", dtype=self.dtype, name="v")(yt)
        qk = qk.reshape(b, n, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k = qk[0] * scale, qk[1]
        v = v.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        out = Dense(c, init_scheme="trunc", dtype=self.dtype, name="proj")(out)
        out = out + xt + yt
        return out.reshape(b, h, w, c)
