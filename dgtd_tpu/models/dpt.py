"""DPT depth head + DINOv2 depther assembly (offline depth generation).

The reference's depth maps come from ``create_depther`` in
/root/reference/dino.py:74-140: a DINOv2 backbone whose ``forward`` is
``get_intermediate_layers(out_indices, reshape=True, return_class_token=True,
norm=final_norm)`` behind a ``CenterPadding(patch_size)`` pre-hook, feeding
the mmseg-style ``DPTHead`` from the public DINOv2 depth-eval release
(``dinov2_vitl14_nyu_dpt_head.pth``). This module is the TPU-native (NHWC
Flax) equivalent; ``tools/convert_ckpt.py`` kind ``dpt_head`` maps the
official head state dict onto it key-for-key.

Head structure (mmseg ``dpt_head.py`` schema, mirrored in param naming):
  reassemble_blocks.readout_projects.{i}  Linear(2D->D)+GELU on [tokens; cls]
  reassemble_blocks.projects.{i}          1x1 conv D -> post_process_channels[i]
  reassemble_blocks.resize_layers.{i}     convT x4 / convT x2 / identity / conv s2
  convs.{i}                               3x3 conv -> channels, no bias
  fusion_blocks.{i}                       residual conv units + x2 bilinear
                                          (align_corners=True) + 1x1 project
  project                                 3x3 conv + ReLU
  conv_depth                              3x3 conv -> n_bins (classify) or 1
Depth regression follows the release's binned-classification head
(``classify=True, n_bins=256, bins_strategy='UD', norm_strategy='linear'``):
relu(logits)+0.1, normalize over bins, expectation against
linspace(min_depth, max_depth) — with the plain relu+min_depth regression
path kept for ``classify=False`` checkpoints (auto-detected by the converter
from ``conv_depth.weight``'s output channels).

TPU-first notes: the two stride==kernel transposed convs are expressed as a
single einsum + reshape (non-overlapping scatter == block outer product —
one MXU matmul, no conv_transpose lowering); all resizes are the framework's
matmul-based ``resize_bilinear``.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..utils.image import resize_bilinear
from .dinov2 import DINOV2_ARCHS, DinoViT
from .layers import Conv, Dense

Dtype = Any


def center_pad(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """``CenterPadding`` parity (dino.py:56-72): F.pad(left = pad//2)."""
    _, h, w, _ = x.shape
    ph = (math.ceil(h / multiple) * multiple) - h
    pw = (math.ceil(w / multiple) * multiple) - w
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))


class _NonOverlapConvTranspose(nn.Module):
    """ConvTranspose2d(C, C, k, stride=k) for stride == kernel: every output
    k x k block is ``x[b,h,w,:] @ K`` — one einsum, exact torch parity with
    K = torch_weight.permute(2, 3, 0, 1) (see converter ``_convT_w``)."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.kernel
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, c, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jnp.einsum("bhwi,acio->bhawco", x, kernel.astype(x.dtype))
        y = y.reshape(b, h * k, w * k, self.features)
        return y + bias.astype(y.dtype)


class ReassembleBlocks(nn.Module):
    """ViT token maps -> 4 pyramid levels at strides p/4, p/2, p, 2p.

    The readout-projection width follows the incoming feature dim (the
    mmseg head's ``embed_dims`` is always the backbone width)."""

    post_process_channels: Sequence[int] = (128, 256, 512, 1024)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        outs = []
        for i, (feat, cls) in enumerate(inputs):
            b, h, w, d = feat.shape
            readout = jnp.broadcast_to(cls[:, None, None, :], feat.shape)
            x = jnp.concatenate([feat, readout], axis=-1)
            x = Dense(d, init_scheme="trunc", dtype=self.dtype, name=f"readout_projects_{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = Conv(
                self.post_process_channels[i], 1, dtype=self.dtype, name=f"projects_{i}"
            )(x)
            if i == 0:
                x = _NonOverlapConvTranspose(
                    self.post_process_channels[0], 4, name="resize_layers_0"
                )(x)
            elif i == 1:
                x = _NonOverlapConvTranspose(
                    self.post_process_channels[1], 2, name="resize_layers_1"
                )(x)
            elif i == 3:
                x = Conv(
                    self.post_process_channels[3], 3, 2, 1, dtype=self.dtype, name="resize_layers_3"
                )(x)
            outs.append(x)
        return outs


class PreActResidualConvUnit(nn.Module):
    """x + conv3(relu(conv3(relu(x)))) (mmseg order=('act','conv','norm'))."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = Conv(self.features, 3, 1, 1, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = Conv(self.features, 3, 1, 1, dtype=self.dtype, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """(skip-add via res unit) -> res unit -> x2 bilinear -> 1x1 project."""

    features: int
    align_corners: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            if skip.shape[1:3] != x.shape[1:3]:
                skip = resize_bilinear(skip, x.shape[1:3], align_corners=False, exact=False)
            x = x + PreActResidualConvUnit(self.features, dtype=self.dtype, name="res_conv_unit1")(skip)
        x = PreActResidualConvUnit(self.features, dtype=self.dtype, name="res_conv_unit2")(x)
        x = resize_bilinear(
            x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=self.align_corners, exact=False
        )
        return Conv(self.features, 1, dtype=self.dtype, name="project")(x)


class DPTHead(nn.Module):
    """mmseg/DINOv2-release DPT depth head."""

    channels: int = 256
    post_process_channels: Sequence[int] = (128, 256, 512, 1024)
    classify: bool = True
    n_bins: int = 256
    bins_strategy: str = "UD"  # "UD" linspace | "SID" logspace
    norm_strategy: str = "linear"  # "linear" | "softmax" | "sigmoid"
    min_depth: float = 0.001
    max_depth: float = 10.0
    fusion_align_corners: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        feats = ReassembleBlocks(
            self.post_process_channels, dtype=self.dtype, name="reassemble_blocks"
        )(inputs)
        feats = [
            Conv(self.channels, 3, 1, 1, use_bias=False, dtype=self.dtype, name=f"convs_{i}")(f)
            for i, f in enumerate(feats)
        ]
        out = FeatureFusionBlock(
            self.channels,
            align_corners=self.fusion_align_corners,
            dtype=self.dtype,
            name="fusion_blocks_0",
        )(feats[-1])
        for i in range(1, len(feats)):
            out = FeatureFusionBlock(
                self.channels,
                align_corners=self.fusion_align_corners,
                dtype=self.dtype,
                name=f"fusion_blocks_{i}",
            )(out, feats[-(i + 1)])
        out = Conv(self.channels, 3, 1, 1, dtype=self.dtype, name="project")(out)
        out = nn.relu(out)

        logits = Conv(
            self.n_bins if self.classify else 1, 3, 1, 1, dtype=self.dtype, name="conv_depth"
        )(out)
        logits = logits.astype(jnp.float32)
        if not self.classify:
            return nn.relu(logits) + self.min_depth
        if self.bins_strategy == "UD":
            bins = jnp.linspace(self.min_depth, self.max_depth, self.n_bins)
        else:  # SID
            bins = jnp.logspace(
                math.log10(self.min_depth), math.log10(self.max_depth), self.n_bins
            )
        if self.norm_strategy == "linear":
            p = nn.relu(logits) + 0.1
            p = p / jnp.sum(p, axis=-1, keepdims=True)
        elif self.norm_strategy == "softmax":
            p = nn.softmax(logits, axis=-1)
        else:  # sigmoid
            p = nn.sigmoid(logits)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jnp.einsum("bhwk,k->bhw", p, bins)[..., None]


class DinoDPTDepther(nn.Module):
    """``create_depther`` parity (dino.py:74-140): CenterPadding -> DINOv2
    intermediate layers -> DPT head -> bilinear resize to the input size.

    ``arch`` picks the backbone size; ``out_indices`` defaults to the
    release's per-size choices (vitl: [4, 11, 17, 23])."""

    arch: str = "vitl14"
    out_indices: Sequence[int] = ()
    final_norm: bool = False
    classify: bool = True
    n_bins: int = 256
    min_depth: float = 0.001
    max_depth: float = 10.0
    channels: int = 256
    post_process_channels: Sequence[int] = (128, 256, 512, 1024)
    pretrain_grid: int = 37  # 518 // 14, the released pos_embed grid
    dtype: Dtype = jnp.float32

    def _default_indices(self, depth: int) -> Tuple[int, ...]:
        if self.out_indices:
            return tuple(self.out_indices)
        return {12: (2, 5, 8, 11), 24: (4, 11, 17, 23), 40: (9, 19, 29, 39)}.get(
            depth, tuple(np.linspace(depth // 6, depth - 1, 4).astype(int))
        )

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        dim, depth, heads, ffn = DINOV2_ARCHS[self.arch]
        xp = center_pad(x, 14)
        feats = DinoViT(
            embed_dim=dim,
            depth=depth,
            num_heads=heads,
            ffn_layer=ffn,
            pretrain_grid=self.pretrain_grid,
            dtype=self.dtype,
            name="backbone",
        )(xp, out_indices=self._default_indices(depth), final_norm=self.final_norm)
        pred = DPTHead(
            channels=self.channels,
            post_process_channels=self.post_process_channels,
            classify=self.classify,
            n_bins=self.n_bins,
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            dtype=self.dtype,
            name="decode_head",
        )(feats)
        # encode_decode resizes the head output back to the (unpadded) input
        # size; mmseg depth heads default align_corners=False
        return resize_bilinear(pred, (h, w), align_corners=False)
