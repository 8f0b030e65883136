"""Fused Pallas LayerNorm (channels-last).

Profiling the flagship forward on v5e shows ~23% of device time in
``convert_reduce_fusion`` ops — the bf16->fp32 statistic passes of the
model's ~90 LayerNorms (PVT blocks, ConvNeXt blocks, patch embeds). This
kernel computes mean/var and applies scale/bias in ONE pass over VMEM-resident
row blocks: bf16 in/out, fp32 statistics, no separate reduce pass.

Forward-only kernel with the backward supplied as the VJP of the identical
jnp math (same pattern as the other kernels in this package).

STATUS — RETIRED from the model path (kept as a tested kernel example).
Measured end-to-end on v5e at the flagship shapes, it is NEUTRAL in both
regimes: train 384² bs32 76.7 vs 78.5 img/s; inference 384² bs8 231.7 vs
230.2 img/s. The convert_reduce fusions it replaces already run at HBM
bandwidth, so a single-pass kernel moves no bottleneck; the model now always
uses flax ``nn.LayerNorm`` (models/layers.py), and the former
``core.flags.use_pallas_layernorm`` surface is deleted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (R, C)
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    out_ref[...] = (
        y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)


def _ln_reference(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_pallas(x, scale, bias, eps: float = 1e-6, interpret: bool = False):
    """LayerNorm over the last axis of ``x`` (any leading shape)."""
    orig_shape = x.shape
    c = orig_shape[-1]
    n = 1
    for s in orig_shape[:-1]:
        n *= s
    x2 = x.reshape(n, c)
    rows = 256
    n_pad = -(-n // rows) * rows
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    kern = functools.partial(_ln_kernel, eps=eps)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out[:n].reshape(orig_shape)


def _ln_fwd(x, scale, bias, eps, interpret):
    return layer_norm_pallas(x, scale, bias, eps, interpret), (x, scale, bias)


def _ln_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: _ln_reference(x_, s_, b_, eps), x, scale, bias)
    return vjp(g)


layer_norm_pallas.defvjp(_ln_fwd, _ln_bwd)
