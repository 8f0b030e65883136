"""MPRNet-style U-Net block zoo: Encoder/Decoder/ORSNet and resizers.

Reference: /root/reference/twig/model/cod.py:511-683 — a family the
reference carries from MPRNet (Encoder, Decoder, DownSample, UpSample,
SkipUpSample, ORB, ORSNet). None of it is reachable from any reference
recipe (the only instantiation, ``stage3_orsnet``, is commented out at
cod.py:713), so no checkpoint contains its keys — the converter closure
test (tests/test_torch_oracle.py) proves that. The classes are provided as
registered surface for completeness and for users composing custom decoders.

NHWC Flax, bf16-ready; the torch ``nn.Upsample(scale_factor=...,
align_corners=False)`` resizes map to half-pixel ``resize_bilinear``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import export
from ..utils.image import resize_bilinear
from .layers import CAB, CABStack as _CABStack, Conv

Dtype = Any


def _resize_half(x):
    h, w = x.shape[1], x.shape[2]
    return resize_bilinear(x, (h // 2, w // 2))


def _resize_double(x):
    h, w = x.shape[1], x.shape[2]
    return resize_bilinear(x, (h * 2, w * 2))


@export
class DownSample(nn.Module):
    """x0.5 bilinear + 1x1 conv widening by ``s_factor`` (cod.py:598-606)."""

    s_factor: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _resize_half(x)
        return Conv(x.shape[-1] + self.s_factor, 1, use_bias=False, dtype=self.dtype)(x)


@export
class UpSample(nn.Module):
    """x2 bilinear + 1x1 conv narrowing by ``s_factor`` (cod.py:609-617)."""

    s_factor: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _resize_double(x)
        return Conv(x.shape[-1] - self.s_factor, 1, use_bias=False, dtype=self.dtype)(x)


@export
class SkipUpSample(nn.Module):
    """UpSample + skip addition (cod.py:620-631)."""

    s_factor: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = _resize_double(x)
        x = Conv(x.shape[-1] - self.s_factor, 1, use_bias=False, dtype=self.dtype)(x)
        return x + skip


@export
class Encoder(nn.Module):
    """3-level CAB encoder with optional cross-stage feature fusion
    (cod.py:511-557). Returns the three per-level features."""

    kernel: int = 3
    reduction: int = 4
    use_bias: bool = False
    scale_unetfeats: int = 32
    csff: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_outs: Optional[Sequence] = None, decoder_outs: Optional[Sequence] = None):
        fuse = encoder_outs is not None and decoder_outs is not None
        outs: List[jnp.ndarray] = []
        for level in range(3):
            x = _CABStack(
                2, self.kernel, self.reduction, self.use_bias, dtype=self.dtype, name=f"encoder_level{level + 1}"
            )(x)
            if fuse:
                x = (
                    x
                    + Conv(x.shape[-1], 1, use_bias=self.use_bias, dtype=self.dtype, name=f"csff_enc{level + 1}")(
                        encoder_outs[level]
                    )
                    + Conv(x.shape[-1], 1, use_bias=self.use_bias, dtype=self.dtype, name=f"csff_dec{level + 1}")(
                        decoder_outs[level]
                    )
                )
            outs.append(x)
            if level < 2:
                x = DownSample(self.scale_unetfeats, dtype=self.dtype, name=f"down{level + 1}{level + 2}")(x)
        return outs


@export
class Decoder(nn.Module):
    """3-level CAB decoder with attended skips (cod.py:560-595).
    Takes the encoder's [enc1, enc2, enc3]; returns [dec1, dec2, dec3]."""

    kernel: int = 3
    reduction: int = 4
    use_bias: bool = False
    scale_unetfeats: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, outs: Sequence[jnp.ndarray]):
        enc1, enc2, enc3 = outs
        dec3 = _CABStack(2, self.kernel, self.reduction, self.use_bias, dtype=self.dtype, name="decoder_level3")(enc3)
        skip2 = CAB(self.kernel, self.reduction, self.use_bias, dtype=self.dtype, name="skip_attn2")(enc2)
        x = SkipUpSample(self.scale_unetfeats, dtype=self.dtype, name="up32")(dec3, skip2)
        dec2 = _CABStack(2, self.kernel, self.reduction, self.use_bias, dtype=self.dtype, name="decoder_level2")(x)
        skip1 = CAB(self.kernel, self.reduction, self.use_bias, dtype=self.dtype, name="skip_attn1")(enc1)
        x = SkipUpSample(self.scale_unetfeats, dtype=self.dtype, name="up21")(dec2, skip1)
        dec1 = _CABStack(2, self.kernel, self.reduction, self.use_bias, dtype=self.dtype, name="decoder_level1")(x)
        return [dec1, dec2, dec3]


@export
class ORB(nn.Module):
    """Original-resolution block: ``num_cab`` CABs + conv, residual
    (cod.py:634-646)."""

    kernel: int = 3
    reduction: int = 4
    use_bias: bool = False
    num_cab: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = _CABStack(self.num_cab, self.kernel, self.reduction, self.use_bias, dtype=self.dtype, name="body")(x)
        res = Conv(x.shape[-1], self.kernel, padding=self.kernel // 2, use_bias=False, dtype=self.dtype, name="tail")(
            res
        )
        return res + x


@export
class ORSNet(nn.Module):
    """Original-resolution subnetwork: 3 ORBs fused with progressively
    upsampled encoder/decoder features (cod.py:649-683). ``x`` carries
    ``n_feat + scale_orsnetfeats`` channels; encoder/decoder outs carry the
    Encoder/Decoder level widths."""

    kernel: int = 3
    reduction: int = 4
    use_bias: bool = False
    scale_unetfeats: int = 32
    num_cab: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_outs: Sequence[jnp.ndarray], decoder_outs: Sequence[jnp.ndarray]):
        wide = x.shape[-1]
        up = lambda name: UpSample(self.scale_unetfeats, dtype=self.dtype, name=name)
        enc = [
            encoder_outs[0],
            up("up_enc1")(encoder_outs[1]),
            up("up_enc2_1")(up("up_enc2_0")(encoder_outs[2])),
        ]
        dec = [
            decoder_outs[0],
            up("up_dec1")(decoder_outs[1]),
            up("up_dec2_1")(up("up_dec2_0")(decoder_outs[2])),
        ]
        for i in range(3):
            x = ORB(self.kernel, self.reduction, self.use_bias, self.num_cab, dtype=self.dtype, name=f"orb{i + 1}")(x)
            x = (
                x
                + Conv(wide, 1, use_bias=self.use_bias, dtype=self.dtype, name=f"conv_enc{i + 1}")(enc[i])
                + Conv(wide, 1, use_bias=self.use_bias, dtype=self.dtype, name=f"conv_dec{i + 1}")(dec[i])
            )
        return x
