"""PVTv2 pyramid vision transformer (Flax, NHWC-native).

TPU-first re-design of the reference's vendored PVTv2
(/root/reference/twig/model/cod.py:1340-1517, blocks at cod.py:824-1004):

  * tokens stay in (B, H, W, C) layout through every block — no
    flatten/permute round-trips; attention reshapes to (B, N, C) only inside
    the einsum, which XLA folds into the q/k/v projections;
  * spatial-reduction attention (SRA) keeps stage-1's 9216-token attention
    MXU-friendly by shrinking K/V with a strided conv (sr_ratio 8/4/2/1);
  * the depthwise 3x3 "MixFFN" conv runs natively on NHWC;
  * per-block additive prompts (the texture-diffusion injection,
    cod.py:1467-1508) are passed in as a per-stage list of NHWC maps and
    bilinearly resized to the stage grid before each block.

Variants b0..b5 mirror cod.py:1762-1811.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..utils.image import resize_bilinear
from .layers import Conv, Dense, DropPath, LayerNorm

Dtype = Any


class MixFFN(nn.Module):
    """fc1 -> depthwise 3x3 conv -> GELU -> fc2 (reference Mlp, cod.py:824-859)."""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.hidden, init_scheme="trunc", dtype=self.dtype)(x)
        x = Conv(
            self.hidden, 3, 1, 1, groups=self.hidden, init_scheme="pvt", dtype=self.dtype
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = Dense(self.out, init_scheme="trunc", dtype=self.dtype)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class SRAttention(nn.Module):
    """Spatial-reduction attention (reference Attention, cod.py:862-921)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5

        q = Dense(c, use_bias=self.qkv_bias, init_scheme="trunc", dtype=self.dtype)(x)
        q = q.reshape(b, h * w, nh, hd)

        if self.sr_ratio > 1:
            kv_in = Conv(
                c, self.sr_ratio, self.sr_ratio, 0, init_scheme="pvt", dtype=self.dtype
            )(x)
            kv_in = LayerNorm(eps=1e-5, dtype=self.dtype)(kv_in)
        else:
            kv_in = x
        kn = kv_in.shape[1] * kv_in.shape[2]
        kv = Dense(2 * c, use_bias=self.qkv_bias, init_scheme="trunc", dtype=self.dtype)(kv_in)
        kv = kv.reshape(b, kn, 2, nh, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, h, w, c)
        out = Dense(c, init_scheme="trunc", dtype=self.dtype)(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dp = DropPath(self.drop_path)
        y = LayerNorm(eps=1e-6, dtype=self.dtype)(x)
        y = SRAttention(
            self.dim,
            self.num_heads,
            self.sr_ratio,
            self.qkv_bias,
            self.attn_drop,
            self.drop,
            dtype=self.dtype,
        )(y, deterministic)
        x = x + dp(y, deterministic)
        y = LayerNorm(eps=1e-6, dtype=self.dtype)(x)
        y = MixFFN(
            int(self.dim * self.mlp_ratio), self.dim, self.drop, dtype=self.dtype
        )(y, deterministic)
        x = x + dp(y, deterministic)
        return x


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv patch embed + LN (cod.py:964-1004)."""

    dim: int
    patch: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.dim,
            self.patch,
            self.stride,
            self.patch // 2,
            init_scheme="pvt",
            dtype=self.dtype,
        )(x)
        x = LayerNorm(eps=1e-5, dtype=self.dtype)(x)
        return x


PVT_V2_CONFIGS = {
    # name: (embed_dims, num_heads, mlp_ratios, depths, sr_ratios)
    # "tiny" is not a reference variant: a 1-block-per-stage config for
    # fast compile-check dry runs (driver multichip dryrun, CI smoke).
    "tiny": ([8, 16, 32, 64], [1, 2, 4, 8], [2, 2, 2, 2], [1, 1, 1, 1], [8, 4, 2, 1]),
    "b0": ([32, 64, 160, 256], [1, 2, 5, 8], [8, 8, 4, 4], [2, 2, 2, 2], [8, 4, 2, 1]),
    "b1": ([64, 128, 320, 512], [1, 2, 5, 8], [8, 8, 4, 4], [2, 2, 2, 2], [8, 4, 2, 1]),
    "b2": ([64, 128, 320, 512], [1, 2, 5, 8], [8, 8, 4, 4], [3, 4, 6, 3], [8, 4, 2, 1]),
    "b3": ([64, 128, 320, 512], [1, 2, 5, 8], [8, 8, 4, 4], [3, 4, 18, 3], [8, 4, 2, 1]),
    "b4": ([64, 128, 320, 512], [1, 2, 5, 8], [8, 8, 4, 4], [3, 8, 27, 3], [8, 4, 2, 1]),
    "b5": ([64, 128, 320, 512], [1, 2, 5, 8], [4, 4, 4, 4], [3, 6, 40, 3], [8, 4, 2, 1]),
}


class PVTv2(nn.Module):
    """4-stage PVTv2 feature pyramid with optional per-block additive prompts.

    ``prompts``: optional list of 4 per-stage lists; prompts[s][i] is an NHWC
    map resized (bilinear, half-pixel) to the stage grid and ADDED to the
    tokens before block i — the reference's texture-diffusion injection
    (cod.py:1469-1505).

    Returns the 4 stage feature maps (NHWC, strides 4/8/16/32).
    """

    variant: str = "b2"
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    qkv_bias: bool = True
    #: rematerialize each transformer block on the backward pass
    #: (jax.checkpoint) — trades ~1/3 more FLOPs for O(depth) less activation
    #: memory, enabling larger train batches.
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        prompts: Optional[List[List[jnp.ndarray]]] = None,
        train: bool = False,
    ):
        dims, heads, ratios, depths, srs = PVT_V2_CONFIGS[self.variant]
        dpr = np.linspace(0, self.drop_path_rate, sum(depths))
        det = not train
        block_cls = nn.remat(PVTBlock, static_argnums=(2,)) if self.remat else PVTBlock
        outs = []
        cur = 0
        for s in range(4):
            x = OverlapPatchEmbed(
                dims[s],
                patch=7 if s == 0 else 3,
                stride=4 if s == 0 else 2,
                dtype=self.dtype,
                name=f"patch_embed{s + 1}",
            )(x)
            h, w = x.shape[1], x.shape[2]
            for i in range(depths[s]):
                if prompts is not None:
                    p = resize_bilinear(prompts[s][i], (h, w), exact=False).astype(x.dtype)
                    x = x + p
                x = block_cls(
                    dims[s],
                    heads[s],
                    ratios[s],
                    srs[s],
                    self.qkv_bias,
                    self.drop_rate,
                    self.attn_drop_rate,
                    float(dpr[cur + i]),
                    dtype=self.dtype,
                    name=f"block{s + 1}_{i}",
                )(x, det)
            x = LayerNorm(eps=1e-6, dtype=self.dtype, name=f"norm{s + 1}")(x)
            outs.append(x)
            cur += depths[s]
        return outs
