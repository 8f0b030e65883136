"""DINOv2 vision transformer backbone (the offline-depther's encoder).

The reference generates its depth maps with ``torch.hub`` DINOv2 ViT-L/14
(/root/reference/dino.py:104) feeding a DPT head; only the *assembly* lives in
the reference — the backbone itself comes from the public
``facebookresearch/dinov2`` release. This module is a TPU-native (NHWC Flax)
implementation of that backbone, exposing the one entry point the depther
uses: ``get_intermediate_layers(n=out_indices, reshape=True,
return_class_token=True, norm=final_norm)`` (dino.py:79-85).

Checkpoint parity: param paths are chosen so the official
``dinov2_vit{s,b,l,g}14_pretrain.pth`` state dict converts mechanically
(``tools/convert_ckpt.py`` kind ``dinov2``); the positional-embedding
interpolation replicates torch ``F.interpolate(..., mode="bicubic",
scale_factor=(h0+0.1)/M)`` bit-for-bit via precomputed separable weight
matrices (the DINOv2 ``interpolate_offset=0.1`` legacy quirk included), so a
converted backbone matches the torch forward at ANY multiple-of-14
resolution, not just the 518 pretrain grid.

TPU-first notes: tokens stay (B, T, D) through the blocks — pure
Dense/matmul work that maps straight onto the MXU; softmax statistics in
fp32; module-level ``dtype`` gives bf16 inference.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import Dense, LayerNorm

Dtype = Any


def torch_bicubic_matrix(n_in: int, n_out: int, scale: float | None = None) -> np.ndarray:
    """(n_out, n_in) weight matrix equal to torch ``F.interpolate`` bicubic
    (align_corners=False, antialias=False) along one axis.

    ``scale`` is the torch ``scale_factor`` for this axis when the caller
    passes one (coordinate mapping then uses 1/scale_factor, NOT
    n_in/n_out — the semantics DINOv2's ``interpolate_offset`` relies on).
    """
    a = -0.75  # torch's cubic convolution constant

    def cubic(t: np.ndarray) -> np.ndarray:
        t = np.abs(t)
        return np.where(
            t <= 1.0,
            (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
            np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
        )

    inv_scale = (1.0 / scale) if scale is not None else n_in / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = inv_scale * (dst + 0.5) - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for tap in range(-1, 3):
        w = cubic(frac - tap)
        idx = np.clip(base + tap, 0, n_in - 1)
        np.add.at(mat, (dst.astype(np.int64), idx), w)
    return mat.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid_hw: Tuple[int, int], offset: float = 0.1
) -> jnp.ndarray:
    """DINOv2 ``interpolate_pos_encoding`` parity (vision_transformer.py).

    ``pos_embed``: (1, 1+M*M, D) fp32 param. Returns (1, 1+h0*w0, D).
    Bicubic with scale_factor=(h0+offset)/M per axis, like the torch code.

    Orientation note: upstream unpacks ``B, nc, w, h = x.shape`` — its ``w``
    is torch dim 2, i.e. the HEIGHT — so its ``sx = (w0+off)/M`` applied to
    interpolate dim -2 scales the height axis by the height-derived factor.
    Despite the misleading names, upstream IS the natural (h0, w0)
    orientation implemented here, row-major-flattened like the patch tokens.
    """
    n = pos_embed.shape[1] - 1
    m = int(math.sqrt(n))
    assert m * m == n, "pos_embed grid must be square"
    h0, w0 = grid_hw
    if (h0, w0) == (m, m):
        return pos_embed
    cls_pos = pos_embed[:, :1]
    grid = pos_embed[0, 1:].reshape(m, m, -1)
    wh = jnp.asarray(torch_bicubic_matrix(m, h0, scale=(h0 + offset) / m))
    ww = jnp.asarray(torch_bicubic_matrix(m, w0, scale=(w0 + offset) / m))
    out = jnp.einsum("om,mnd->ond", wh, grid)
    out = jnp.einsum("pn,ond->opd", ww, out)
    return jnp.concatenate([cls_pos, out.reshape(1, h0 * w0, -1)], axis=1)


class DinoAttention(nn.Module):
    """Fused-qkv multi-head self-attention (dinov2 ``MemEffAttention``)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = Dense(3 * c, init_scheme="trunc", dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, c)
        return Dense(c, init_scheme="trunc", dtype=self.dtype, name="proj")(out)


class _LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,), jnp.float32
        )
        return x * gamma.astype(x.dtype)


class DinoBlock(nn.Module):
    """pre-LN block with LayerScale: x += ls1(attn(n1(x))); x += ls2(mlp(n2(x))).

    ``ffn_layer``: "mlp" (fc1/GELU/fc2 — vits/b/l) or "swiglufused"
    (w12 → split → silu(x1)*x2 → w3 — the released ViT-g/14; hidden width
    is the SwiGLU-aligned (int(dim*ratio*2/3)+7)//8*8)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    ffn_layer: str = "mlp"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        h = DinoAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h)
        x = x + _LayerScale(self.dim, name="ls1")(h)
        h = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        if self.ffn_layer == "swiglufused":
            hidden = (int(self.dim * self.mlp_ratio * 2 / 3) + 7) // 8 * 8
            h12 = Dense(2 * hidden, init_scheme="trunc", dtype=self.dtype, name="mlp_w12")(h)
            x1, x2 = jnp.split(h12, 2, axis=-1)
            h = nn.silu(x1) * x2
            h = Dense(self.dim, init_scheme="trunc", dtype=self.dtype, name="mlp_w3")(h)
        else:
            h = Dense(int(self.dim * self.mlp_ratio), init_scheme="trunc", dtype=self.dtype, name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = Dense(self.dim, init_scheme="trunc", dtype=self.dtype, name="mlp_fc2")(h)
        return x + _LayerScale(self.dim, name="ls2")(h)


# (embed_dim, depth, num_heads, ffn_layer) for the four released sizes;
# giant uses the fused-SwiGLU FFN (hub dinov2_vitg14: ffn_layer="swiglufused")
DINOV2_ARCHS = {
    "vits14": (384, 12, 6, "mlp"),
    "vitb14": (768, 12, 12, "mlp"),
    "vitl14": (1024, 24, 16, "mlp"),
    "vitg14": (1536, 40, 24, "swiglufused"),
}


class DinoViT(nn.Module):
    """DINOv2 ViT-*/14. ``__call__`` returns the depther's interface:
    a list of (patch_features_NHWC, cls_token) per requested block index."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    mlp_ratio: float = 4.0
    ffn_layer: str = "mlp"
    pretrain_grid: int = 37  # 518 // 14; sets the pos_embed param shape
    interpolate_offset: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        out_indices: Sequence[int] = (),
        final_norm: bool = False,
        return_all_tokens: bool = False,
    ):
        b, h, w, _ = x.shape
        assert h % self.patch_size == 0 and w % self.patch_size == 0, (
            "input must be CenterPadding-aligned to the patch size"
        )
        h0, w0 = h // self.patch_size, w // self.patch_size
        # patch embed: conv14/s14 == per-patch dense
        from .layers import Conv

        tok = Conv(
            self.embed_dim,
            self.patch_size,
            self.patch_size,
            0,
            init_scheme="pvt",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        tok = tok.reshape(b, h0 * w0, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        n_pos = self.pretrain_grid * self.pretrain_grid + 1
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_pos, self.embed_dim),
            jnp.float32,
        )
        tok = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(tok.dtype), tok], axis=1)
        pos = interpolate_pos_embed(pos_embed, (h0, w0), self.interpolate_offset)
        tok = tok + pos.astype(tok.dtype)

        indices = set(int(i) % self.depth for i in out_indices)
        outs = []
        for i in range(self.depth):
            tok = DinoBlock(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.ffn_layer,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(tok)
            if i in indices:
                outs.append(tok)
        if not indices:
            outs = [tok]

        norm = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm")
        results = []
        for o in outs:
            if final_norm:
                o = norm(o)
            cls = o[:, 0]
            patches = o[:, 1:]
            if not return_all_tokens:
                patches = patches.reshape(b, h0, w0, self.embed_dim)
            results.append((patches, cls))
        # keep the final-norm params in the tree even when the depther
        # disables final_norm (checkpoint key coverage)
        if not final_norm:
            _ = norm(outs[-1][:, :1])
        return results
