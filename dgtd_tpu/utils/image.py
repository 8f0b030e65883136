"""TPU-friendly image ops with exact PyTorch numerical semantics.

The reference model leans heavily on ``F.interpolate(mode='bilinear')`` with
both ``align_corners`` conventions (e.g. /root/reference/twig/model/cod.py:707,
:727-731 use align_corners=True; prompt resizing at cod.py:1471 and prediction
upsampling at cod.py:796 use the default align_corners=False), on
``F.avg_pool2d`` (loss weighting, cod.py:77; SSIM, cod.py:319), and on
``F.unfold`` (message passing stencil, cod.py:1204).

TPU-first design notes:
  * Bilinear resize is expressed as two small dense matmuls (separable
    interpolation along H then W). The interpolation matrices are built
    host-side with numpy at trace time and become XLA constants — the resize
    itself rides the MXU instead of gather units, and fuses with neighboring
    elementwise work. Exactly reproduces torch's half-pixel
    (align_corners=False, with edge clamping) and align_corners=True grids.
  * Pooling uses ``lax.reduce_window`` (count_include_pad=True divide, the
    torch default).
  * All ops take NHWC, the native TPU conv layout.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) bilinear interpolation matrix, torch semantics."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        w[:, 0] = 1.0
        return w.astype(np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (dst + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, None)  # torch clamps negative source coords to 0
    x0 = np.floor(src).astype(np.int64)
    x0 = np.minimum(x0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    frac = np.clip(src - x0, 0.0, 1.0)
    rows = np.arange(out_size)
    np.add.at(w, (rows, x0), 1.0 - frac)
    np.add.at(w, (rows, x1), frac)
    return w.astype(np.float32)


def resize_bilinear(
    x: jax.Array,
    size: Tuple[int, int],
    align_corners: bool = False,
    exact: bool = True,
) -> jax.Array:
    """Bilinear-resize NHWC ``x`` to ``size=(H, W)`` with torch semantics.

    Implemented as ``Wh @ x @ Ww^T`` — two matmuls along the spatial axes.

    ``exact=True`` (default): fp32 accumulation at HIGHEST MXU precision —
    bit-level torch parity for metric-critical paths (prediction upsampling,
    data preprocessing). ``exact=False``: compute in the input dtype at
    default precision — for internal bf16 feature resizes (prompt/stage maps)
    where the surrounding compute is already bf16.
    """
    b, h, w, c = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    if exact:
        compute = x.astype(jnp.float32)
        prec = lax.Precision.HIGHEST
    else:
        compute = x
        prec = None
    if h != out_h:
        wh = jnp.asarray(_interp_matrix(h, out_h, align_corners)).astype(compute.dtype)
        compute = jnp.einsum("oh,bhwc->bowc", wh, compute, precision=prec)
    if w != out_w:
        ww = jnp.asarray(_interp_matrix(w, out_w, align_corners)).astype(compute.dtype)
        compute = jnp.einsum("ow,bhwc->bhoc", ww, compute, precision=prec)
    return compute.astype(dtype)


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize, torch ``F.interpolate(mode='nearest')`` parity:
    src index = floor(dst * in / out). Used by the reference's texture
    downsample (``F.interpolate(x, size=[H,H])`` with default mode,
    cod.py:1295)."""
    b, h, w, c = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (h, w) == (out_h, out_w):
        return x
    rows = np.floor(np.arange(out_h) * (h / out_h)).astype(np.int32)
    cols = np.floor(np.arange(out_w) * (w / out_w)).astype(np.int32)
    return x[:, jnp.asarray(rows)][:, :, jnp.asarray(cols)]


def resize_scale(x: jax.Array, scale: float, align_corners: bool = False) -> jax.Array:
    """``F.interpolate(scale_factor=scale)`` parity: floor(size * scale)."""
    b, h, w, c = x.shape
    return resize_bilinear(
        x, (int(np.floor(h * scale)), int(np.floor(w * scale))), align_corners
    )


def avg_pool(
    x: jax.Array,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """NHWC average pool, torch ``F.avg_pool2d`` (count_include_pad=True).

    Separable: two 1-D window sums instead of one k×k window — identical
    result, k²/2k the work (matters for the 31×31 loss-weighting pool,
    reference cod.py:77)."""
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, kernel, 1, 1),
        window_strides=(1, stride, 1, 1),
        padding=((0, 0), (padding, padding), (0, 0), (0, 0)),
    )
    summed = lax.reduce_window(
        summed,
        0.0,
        lax.add,
        window_dimensions=(1, 1, kernel, 1),
        window_strides=(1, 1, stride, 1),
        padding=((0, 0), (0, 0), (padding, padding), (0, 0)),
    )
    return (summed / float(kernel * kernel)).astype(x.dtype)


def max_pool(x: jax.Array, kernel: int, stride: int, padding: int = 0) -> jax.Array:
    """NHWC max pool."""
    init = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """NHWC reflection pad on spatial dims (torch ``nn.ReflectionPad2d``)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def extract_patches(x: jax.Array, kernel: int, padding: int) -> jax.Array:
    """im2col for stride-1 stencils: NHWC -> (B, H, W, C, kernel*kernel).

    Tap ordering matches torch ``F.unfold`` (row-major over the kernel window)
    so that affinity tensors laid out as (latent, k*k) line up with the
    reference's ``weight.view(n, wc, k*k, h*w)`` (cod.py:1193).
    Zero padding; output spatial size equals input when padding == kernel//2.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    out_h = h + 2 * padding - kernel + 1
    out_w = w + 2 * padding - kernel + 1
    taps = []
    for ki in range(kernel):
        for kj in range(kernel):
            taps.append(lax.slice(xp, (0, ki, kj, 0), (b, ki + out_h, kj + out_w, c)))
    return jnp.stack(taps, axis=-1)  # (B, out_h, out_w, C, k*k)


def fft_high_pass(x: jax.Array, rate: float) -> jax.Array:
    """FFT high-pass texture extraction (reference ``prompt_encoder.fft``,
    /root/reference/twig/model/cod.py:1256-1271).

    Zeros a centered low-frequency square of side ``2 * int(sqrt(H*W*rate)//2)``
    in the fftshift'ed spectrum (norm='forward'), inverse-transforms, and
    returns the absolute real part. NHWC in/out.
    """
    b, h, w, c = x.shape
    line = int((h * w * rate) ** 0.5 // 2)
    # build the (1-mask) high-pass filter host-side: constant under jit
    keep = np.ones((h, w), dtype=np.float32)
    keep[h // 2 - line : h // 2 + line, w // 2 - line : w // 2 + line] = 0.0
    keep_shifted = np.fft.ifftshift(keep)  # apply mask without materializing fftshift
    spec = jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2), norm="forward")
    spec = spec * jnp.asarray(keep_shifted)[None, :, :, None]
    inv = jnp.fft.ifft2(spec, axes=(1, 2), norm="forward").real
    return jnp.abs(inv).astype(x.dtype)


def normalize_01(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Global min-max normalize (reference cod.py:143)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo + eps)


def compute_surface_normals(depth: jax.Array) -> jax.Array:
    """Depth map -> unit surface normals (reference ``compute_surface_normals``,
    cod.py:96-109: central-difference gradients, n = (-dz/dx, -dz/dy, 1)
    normalized). NHWC: depth (B, H, W, 1) -> normals (B, H, W, 3).

    NOTE: the reference calls this each forward and discards the result
    (cod.py:125); provided here as a usable utility instead."""
    d = depth[..., 0].astype(jnp.float32)
    dzdy, dzdx = jnp.gradient(d, axis=(1, 2))
    nx = -dzdy  # reference's dim=2 (rows) gradient feeds normal_x
    ny = -dzdx
    nz = jnp.ones_like(d)
    norm = jnp.sqrt(nx**2 + ny**2 + nz**2)
    return jnp.stack([nx / norm, ny / norm, nz / norm], axis=-1).astype(depth.dtype)
