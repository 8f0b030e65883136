"""ConvNeXt tower + FPN fusion head (the texture-embedding encoder).

Reference: ``ShapePropEncoder`` at /root/reference/twig/model/cod.py:1119-1177
(ConvNeXt-Base: dims [128,256,512,1024], depths [3,3,27,3], drop-path 0.4,
layer-scale 1.0; a 4-level 1x1-conv FPN head that resizes all levels to the
stride-4 grid and fuses to ``out_dim`` channels) and ``convnext_Block`` at
cod.py:1082-1117.

TPU-first notes: NHWC end-to-end, the 7x7 depthwise conv runs natively on
the VPU/MXU via ``feature_group_count``, pointwise convs are Dense layers
that fuse with GELU under XLA, and the whole 27-block stage-3 is the model's
single hottest module (SURVEY.md §3 hot-loop ranking) so it inherits the
module-level ``dtype`` (bf16 in training).

Init parity: this tower sits under the reference PVT's ``apply(_init_weights)``
(cod.py:1399), so linears are trunc_normal(0.02), convs normal(0, sqrt(2/fan_out)).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..utils.image import resize_bilinear
from .layers import Conv, Dense, DropPath, LayerNorm

Dtype = Any


class ConvNeXtBlock(nn.Module):
    """dw7x7 -> LN -> Linear(4x) -> GELU -> Linear -> gamma -> droppath + res."""

    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        res = x
        x = Conv(self.dim, 7, 1, 3, groups=self.dim, init_scheme="pvt", dtype=self.dtype)(x)
        x = LayerNorm(eps=1e-6, dtype=self.dtype)(x)
        x = Dense(4 * self.dim, init_scheme="trunc", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = Dense(self.dim, init_scheme="trunc", dtype=self.dtype)(x)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
                jnp.float32,
            )
            x = x * gamma.astype(x.dtype)
        x = DropPath(self.drop_path)(x, deterministic)
        return res + x


class ConvNeXtFPNEncoder(nn.Module):
    """4-stage ConvNeXt + stride-4 FPN fusion to ``out_dim`` channels."""

    out_dim: int = 24
    dims: Sequence[int] = (128, 256, 512, 1024)
    depths: Sequence[int] = (3, 3, 27, 3)
    drop_path_rate: float = 0.4
    layer_scale_init: float = 1.0
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        block_cls = nn.remat(ConvNeXtBlock, static_argnums=(2,)) if self.remat else ConvNeXtBlock
        outs = []
        cur = 0
        for i in range(len(self.dims)):
            if i == 0:
                x = Conv(self.dims[0], 4, 4, 0, init_scheme="pvt", dtype=self.dtype, name="stem_conv")(x)
                x = LayerNorm(eps=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = LayerNorm(eps=1e-6, dtype=self.dtype, name=f"down_norm{i}")(x)
                x = Conv(self.dims[i], 2, 2, 0, init_scheme="pvt", dtype=self.dtype, name=f"down_conv{i}")(x)
            for j in range(self.depths[i]):
                x = block_cls(
                    self.dims[i],
                    float(dpr[cur + j]),
                    self.layer_scale_init,
                    dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x, det)
            cur += self.depths[i]
            outs.append(x)

        # FPN head: 1x1 per level, resize to the stride-4 grid, concat, fuse
        target = outs[0].shape[1:3]
        lateral = [
            resize_bilinear(
                Conv(self.out_dim, 1, init_scheme="pvt", dtype=self.dtype, name=f"lateral{i}")(outs[i]),
                target,
                exact=False,
            )
            for i in range(len(self.dims))
        ]
        fused = Conv(self.out_dim, 1, init_scheme="pvt", dtype=self.dtype, name="fusion")(
            jnp.concatenate(lateral, axis=-1)
        )
        return fused
