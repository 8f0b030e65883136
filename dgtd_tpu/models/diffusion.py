"""Depth-guided texture diffusion — the paper-core prompt modules.

Reference: /root/reference/twig/model/cod.py:1025-1337 —
  * ``ShapePropWeightRegressor`` (cod.py:1051-1060): 1x1 conv texture ->
    sigmoid per-pixel k*k graph affinities;
  * ``MessagePassing`` (cod.py:1180-1208): random-walk-normalize the
    affinities, then ``max_step`` iterations of unfold(k)·w·sum — depth
    diffuses along texture-derived edges on a small grid; 1x1 conv to 3ch and
    bilinear upsample to full resolution;
  * ``prompt_encoder`` (cod.py:1228-1306): FFT high-pass texture ->
    affinities at a 12x12 grid; 1x1-conv depth embedding; diffusion;
    ConvNeXt+FPN encoding of (diffused depth + image);
  * ``prompt_decoder`` (cod.py:1308-1323): per transformer block, a 3-conv
    decoder emitting one additive prompt map.

The reference's ablation variants (deleted-but-cached iter1..iter9, kernel3..
kernel11, size22..size60, dim20/dim28 modules — SURVEY.md §0) varied the
diffusion hyperparameters by copying files; here they are config fields
(``steps``, ``kernel``, ``grid``, ``latent_dim``, ``freq_rate``).

The jnp message-passing path below is the reference implementation for the
Pallas stencil kernel in ``dgtd_tpu/ops/diffusion_pallas.py`` (used for large
grids / the 1024² serving config); at the recipe's 12x12 grid the fused XLA
form is already bandwidth-trivial.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.image import (
    extract_patches,
    fft_high_pass,
    resize_bilinear,
    resize_nearest,
)
from .convnext import ConvNeXtFPNEncoder
from .layers import Conv, PlaneConv1x1

Dtype = Any

#: grids at or above this edge length route through the fused Pallas stencil
#: kernel in plane layout; the recipes' 12x12 grid stays on fused XLA.
PALLAS_MIN_GRID = 64


def _use_plane_path(grid_h: int, grid_w: int) -> bool:
    """Auto kernel/layout selection for the diffusion stencil, overridable
    via core.flags.diffusion_plane_layout (tests force it on CPU interpret)."""
    from ..core import flags

    if flags.diffusion_plane_layout is not None:
        return bool(flags.diffusion_plane_layout)
    return min(grid_h, grid_w) >= PALLAS_MIN_GRID and jax.default_backend() == "tpu"


def message_passing_step(x: jnp.ndarray, norm_weight: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """One diffusion step: x (B,H,W,C), norm_weight (B,H,W,C,k*k)."""
    patches = extract_patches(x, kernel, kernel // 2)  # (B,H,W,C,k*k)
    return jnp.sum(patches * norm_weight, axis=-1)


def normalize_affinity(weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Random-walk normalization D^-1 A over the tap axis (cod.py:1201)."""
    return weight / (jnp.sum(weight, axis=-1, keepdims=True) + eps)


def _hw(size) -> tuple:
    """(H, W) from an int (square, back-compat) or an (H, W) pair."""
    return (int(size), int(size)) if isinstance(size, int) else tuple(size)


class MessagePassing(nn.Module):
    """Iterated affinity-weighted stencil aggregation + 1x1 conv to 3ch.

    cod recipe: kernel=7, steps=4 (cod.py:1181); baseline: kernel=3, steps=6
    (baseline.py:1150, unfold padding 1 at baseline.py:1174).
    """

    latent_dim: int = 24
    kernel: int = 7
    steps: int = 4
    out_size: tuple = (384, 384)  # (H, W) — rectangular inputs supported
    #: tests force the Pallas path in interpret mode on CPU
    pallas_interpret: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, weight, plane_layout: bool = False):
        k2 = self.kernel * self.kernel
        if plane_layout:
            # serving path: x (B, C, H, W) planes, weight (B, C*k², H, W)
            # straight from the PlaneConv1x1 regressor — the v2 kernel's
            # layout with NO NHWC<->plane transposes (at a 512² grid the
            # weight transpose alone would round-trip ~0.6 GB through HBM).
            from ..ops.diffusion_pallas import diffusion_pallas_v2_planes

            b, c, h, w = x.shape
            wt = weight.reshape(b * c, k2, h, w).astype(jnp.float32)
            wt = (wt / (jnp.sum(wt, axis=1, keepdims=True) + 1e-5)).astype(x.dtype)
            xp = x.reshape(b * c, h, w)
            xp = diffusion_pallas_v2_planes(
                xp, wt, self.kernel, self.steps, self.pallas_interpret
            )
            x = PlaneConv1x1(3, init_scheme="pvt", dtype=self.dtype, name="Conv_0")(
                xp.reshape(b, c, h, w), input_layout="NCHW"
            )  # (B, 3, H, W)
            x = x.transpose(0, 2, 3, 1)  # tiny 3-channel transpose
            return resize_bilinear(x, _hw(self.out_size))

        b, h, w, c = x.shape
        # weight arrives as (B, h, w, latent_dim * k*k), channel-major like the
        # reference's view(n, latent, k*k, h*w) (cod.py:1193)
        wt = weight.reshape(b, h, w, c, k2)
        wt = normalize_affinity(wt.astype(jnp.float32)).astype(x.dtype)
        if _use_plane_path(h, w):
            # v2 plane-layout kernel behind the NHWC wrapper (transposes at
            # the boundary). Measured 1.9x faster than the fused-XLA form at
            # 256² on v5e (0.92 vs 1.74 ms/step, ~336 GB/s effective on the
            # 308 MB/step affinity stream). Callers that can emit planes
            # directly should use ``plane_layout=True`` instead.
            from ..ops.diffusion_pallas import diffusion_pallas_v2

            x = diffusion_pallas_v2(x, wt, self.kernel, self.steps, self.pallas_interpret)
        else:
            for _ in range(self.steps):
                x = message_passing_step(x, wt, self.kernel)
        x = Conv(3, 1, init_scheme="pvt", dtype=self.dtype)(x)
        return resize_bilinear(x, _hw(self.out_size))


class PromptEncoder(nn.Module):
    """texture -> affinities -> depth diffusion -> ConvNeXt embedding.

    Returns ``(texture, embedding)``: the full-res FFT high-pass texture map
    (what the reference calls ``embedding1`` and feeds the SSIM loss) and the
    (B, H/4, W/4, 24) prompt embedding.

    ``fft_at_grid`` selects the baseline variant's order (downsample to the
    grid bilinearly, then FFT — baseline.py:1253-1257) vs the cod variant
    (FFT at full res, nearest-downsample to the grid — cod.py:1288-1295).
    """

    latent_dim: int = 24
    grid: int = 12
    freq_rate: float = 0.3
    kernel: int = 7
    steps: int = 4
    fft_at_grid: bool = False
    #: tests force the Pallas diffusion path in interpret mode on CPU
    pallas_interpret: bool = False
    convnext_dims: Tuple[int, ...] = (128, 256, 512, 1024)
    convnext_depths: Tuple[int, ...] = (3, 3, 27, 3)
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, depth, train: bool = False):
        size = (image.shape[1], image.shape[2])  # rectangular-safe
        g = self.grid
        if self.fft_at_grid:
            texture = fft_high_pass(resize_bilinear(image, (g, g)), self.freq_rate)
            tex_grid = texture
        else:
            texture = fft_high_pass(image, self.freq_rate)
            tex_grid = resize_nearest(texture, (g, g))

        # depth -> latent cues (cod.py:1249,1297). The reference convs at full
        # res then downsamples; a 1x1 conv and bilinear resize commute exactly
        # (both linear, resize weights sum to 1), so we resize first and run
        # the conv on the tiny grid.
        depth_grid = resize_bilinear(depth, (g, g))

        plane = _use_plane_path(g, g)
        mp = MessagePassing(
            self.latent_dim,
            self.kernel,
            self.steps,
            out_size=size,
            pallas_interpret=self.pallas_interpret,
            dtype=self.dtype,
            name="message_passing",
        )
        if plane:
            # large-grid serving: the affinity regressor and cue encoder emit
            # channel planes straight from their matmul epilogues, so the
            # whole diffusion stack runs transpose-free in the v2 kernel's
            # layout (param trees identical to the NHWC branch).
            weights = PlaneConv1x1(
                self.latent_dim * self.kernel * self.kernel,
                init_scheme="pvt",
                dtype=self.dtype,
                name="weight_regressor",
            )(tex_grid)
            weights = nn.sigmoid(weights)
            cues_grid = PlaneConv1x1(
                self.latent_dim, init_scheme="pvt", dtype=self.dtype, name="encoder1"
            )(depth_grid)
            diffused = mp(cues_grid, weights, plane_layout=True)
        else:
            # per-pixel k*k affinity field regressed from texture (cod.py:1051-1060)
            weights = Conv(
                self.latent_dim * self.kernel * self.kernel,
                1,
                init_scheme="pvt",
                dtype=self.dtype,
                name="weight_regressor",
            )(tex_grid)
            weights = nn.sigmoid(weights)
            cues_grid = Conv(
                self.latent_dim, 1, init_scheme="pvt", dtype=self.dtype, name="encoder1"
            )(depth_grid)
            diffused = mp(cues_grid, weights)

        # ConvNeXt-FPN embedding of diffused depth + image (cod.py:1302)
        embedding = ConvNeXtFPNEncoder(
            out_dim=24,
            dims=tuple(self.convnext_dims),
            depths=tuple(self.convnext_depths),
            remat=self.remat,
            dtype=self.dtype,
            name="encoder2",
        )(diffused + image, train=train)
        return texture, embedding


class ShapePropDecoder(nn.Module):
    """3x3 conv x3 with ReLUs: latent -> stage channels (cod.py:1210-1226)."""

    out_dim: int
    latent_dim: int = 24
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.latent_dim, 3, 1, 1, init_scheme="pvt", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv(self.latent_dim, 3, 1, 1, init_scheme="pvt", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv(self.out_dim, 3, 1, 1, init_scheme="pvt", dtype=self.dtype)(x)
        return x


class PromptDecoder(nn.Module):
    """One ShapePropDecoder per transformer block of a stage (cod.py:1308-1323)."""

    embed_dim: int
    depth: int
    latent_dim: int = 24
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embedding) -> List[jnp.ndarray]:
        return [
            ShapePropDecoder(
                self.embed_dim, self.latent_dim, dtype=self.dtype, name=f"decoder{i}"
            )(embedding)
            for i in range(self.depth)
        ]
