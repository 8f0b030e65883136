"""Pallas TPU kernel for the depth-diffusion stencil (large-grid path).

The paper-core MessagePassing op (reference cod.py:1180-1208) is, per step,
``x <- sum_t unfold_t(x) * w_t`` — a k×k stencil whose per-pixel, per-channel
tap weights come from the texture affinity field. At the recipe's 12×12 grid
the jnp form is trivial, but the 1024² serving config (SURVEY.md §5
"long-context" analog: spatial scaling) runs the stencil on large grids where
the XLA lowering materializes the (B, H, W, C, k²) unfold per step — k²×
HBM amplification.

This kernel fuses unfold·w·sum into row-strip programs: each program holds a
(strip+2r, W+2r, C) input window and the strip's tap-major weights in VMEM and
accumulates the k² shifted multiply-adds on the VPU — input and weights are
each read from HBM exactly once per step, nothing k²-sized is ever
materialized. Steps iterate at the JAX level (weights re-streamed per step,
matching the reference's semantics of a step-invariant affinity field).

Layouts:
  x:       (B, H, W, C)         NHWC
  weights: (B, H, W, k²*C)      tap-major (tap, channel) — normalized
Returns  (B, H, W, C).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _stencil_kernel(x_ref, w_ref, out_ref, *, K: int, C: int, W: int, STRIP: int):
    """x_ref: (1, STRIP+2r, W+2r, C); w_ref: (1, STRIP, W, K*K*C);
    out_ref: (1, STRIP, W, C)."""
    acc = jnp.zeros((STRIP, W, C), jnp.float32)
    for t in range(K * K):
        dy, dx = t // K, t % K
        xs = x_ref[0, dy : dy + STRIP, dx : dx + W, :]
        wt = w_ref[0, :, :, t * C : (t + 1) * C]
        acc = acc + xs.astype(jnp.float32) * wt.astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_strip(h: int, w: int, c: int, kernel: int, budget_bytes: int = 4 * 2**20) -> int:
    """Largest strip whose weights block (the dominant VMEM tenant,
    strip*W*k²*C*4 bytes, double-buffered by the pipeline) fits the budget."""
    per_row = w * kernel * kernel * c * 4
    for s in (32, 16, 8, 4, 2, 1):
        if h % s == 0 and s * per_row <= budget_bytes:
            return s
    return 1


def diffusion_step_pallas(
    x: jnp.ndarray, weights_tap_major: jnp.ndarray, kernel: int, interpret: bool = False
) -> jnp.ndarray:
    """One stencil step. ``weights_tap_major``: (B, H, W, k²*C), tap-major."""
    b, h, w, c = x.shape
    r = kernel // 2
    strip = _pick_strip(h, w, c, kernel)
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))

    kern = functools.partial(_stencil_kernel, K=kernel, C=c, W=w, STRIP=strip)
    return pl.pallas_call(
        kern,
        grid=(b, h // strip),
        in_specs=[
            # overlapping halo windows: strip j reads padded rows
            # [j*strip, j*strip + strip + 2r) — pl.Element gives element-offset
            # indexing for the halo dim
            pl.BlockSpec(
                # Mosaic requires all-or-none Element dims in a spec: use
                # element offsets everywhere for the halo'd input window
                (pl.Element(1), pl.Element(strip + 2 * r), pl.Element(w + 2 * r), pl.Element(c)),
                lambda i, j: (i, j * strip, 0, 0),
            ),
            pl.BlockSpec((1, strip, w, kernel * kernel * c), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, strip, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, weights_tap_major)


def to_tap_major(norm_weight: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C, k²) channel-major -> (B, H, W, k²*C) tap-major."""
    b, h, w, c, kk = norm_weight.shape
    return norm_weight.transpose(0, 1, 2, 4, 3).reshape(b, h, w, kk * c)


# ---------------------------------------------------------------------------
# Fused Pallas backward (the reference's col2im analog)
#
# The generic VJP of the stencil materializes the (P, k², H, W) unfold —
# exactly what the forward kernel avoids. These kernels keep the backward
# streaming too:
#   dx[q'] = Σ_t (g ⊙ w_t)[q' + (r-dy, r-dx)]   (transpose stencil, kernel A)
#   dw_t[q] = g[q] · x[q + (dy-r, dx-r)]          (per-tap product, kernel B)
# Each reads its operands once; nothing k²-sized is materialized beyond the
# (true) k²-sized dw output itself. (Reference counterpart: the 5 CUDA col2im
# shm-reduction variants, ms_deform_im2col_cuda.cuh:301-921.)
# ---------------------------------------------------------------------------


def _stencil_bwd_x_kernel(g_ref, w_ref, out_ref, *, K: int, W: int, STRIP: int):
    """g_ref: (1, H+2r, W+2r) padded grad; w_ref: (1, K*K, STRIP+2r, W+2r)
    halo'd weights; out_ref: (1, STRIP, W)."""
    j = pl.program_id(1)
    row0 = pl.multiple_of(j * STRIP, STRIP)
    r = K // 2
    g_slab = g_ref[0, pl.ds(row0, STRIP + 2 * r), :]  # (STRIP+2r, W+2r)
    acc = jnp.zeros((STRIP, W), jnp.float32)
    for t in range(K * K):
        dy, dx = t // K, t % K
        oy, ox = 2 * r - dy, 2 * r - dx  # source offset for the transpose tap
        gs = g_slab[oy : oy + STRIP, ox : ox + W]
        ws = w_ref[0, t, oy : oy + STRIP, ox : ox + W]
        acc = acc + gs.astype(jnp.float32) * ws.astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _stencil_bwd_w_kernel(x_ref, g_ref, out_ref, *, K: int, W: int, STRIP: int):
    """x_ref: (1, H+2r, W+2r) padded input; g_ref: (1, STRIP, W);
    out_ref: (1, K*K, STRIP, W)."""
    j = pl.program_id(1)
    row0 = pl.multiple_of(j * STRIP, STRIP)
    slab = x_ref[0, pl.ds(row0, STRIP + 2 * (K // 2)), :]
    g = g_ref[0].astype(jnp.float32)
    for t in range(K * K):
        dy, dx = t // K, t % K
        xs = slab[dy : dy + STRIP, dx : dx + W]
        out_ref[0, t] = (g * xs.astype(jnp.float32)).astype(out_ref.dtype)


def _pad_rows_to8(h: int) -> int:
    """v2 strips need sublane (8-row) alignment; arbitrary H is handled by
    zero-padding rows to the next multiple of 8 and slicing the result."""
    return -(-h // 8) * 8


def _aligned_strip(h: int, block_bytes) -> int:
    """Largest sublane-aligned (8-row) strip dividing ``h`` whose dominant
    VMEM block (``block_bytes(s)``, caller-specific) fits the 4 MB budget.
    If nothing fits, fall back to the SMALLEST aligned strip (8) — never h,
    whose blocks at serving widths would be hundreds of MB and fail to
    compile. Single source of the strip policy for fwd AND bwd; only the
    block-size estimate differs per direction."""
    for s in (64, 32, 16, 8):
        if h % s == 0 and block_bytes(s) <= 4 * 2**20:
            return s
    return 8


def _bwd_strip(h: int, w: int, kernel: int) -> int:
    # bwd's dominant block: the halo'd (s+k-1, w+k-1) grad slab per tap
    return _aligned_strip(
        h, lambda s: kernel * kernel * (s + kernel - 1) * (w + kernel - 1) * 4
    )


def diffusion_step_bwd_pallas(
    g_planes: jnp.ndarray,
    x_planes: jnp.ndarray,
    w_planes: jnp.ndarray,
    kernel: int,
    interpret: bool = False,
):
    """One-step backward in plane layout.

    g (P, H, W) = dL/d(step output); x (P, H, W) = step input;
    w (P, k², H, W) normalized weights. Returns (dx, dw) in the same layouts.
    """
    p, h0, w = g_planes.shape
    h = _pad_rows_to8(h0)
    if h != h0:
        # zero rows beyond H contribute nothing (matches the zero halo)
        g_planes = jnp.pad(g_planes, ((0, 0), (0, h - h0), (0, 0)))
        x_planes = jnp.pad(x_planes, ((0, 0), (0, h - h0), (0, 0)))
        w_planes = jnp.pad(w_planes, ((0, 0), (0, 0), (0, h - h0), (0, 0)))
    r = kernel // 2
    strip = _bwd_strip(h, w, kernel)
    g_pad = jnp.pad(g_planes, ((0, 0), (r, r), (r, r)))
    # Mosaic needs the Element block's sublane dim %8: round the weight slab
    # height up and bottom-pad the array so every strip's window is in bounds
    slab_h = -(-(strip + 2 * r) // 8) * 8
    w_pad = jnp.pad(w_planes, ((0, 0), (0, 0), (r, slab_h - strip - r), (r, r)))
    x_pad = jnp.pad(x_planes, ((0, 0), (r, r), (r, r)))

    kern_x = functools.partial(_stencil_bwd_x_kernel, K=kernel, W=w, STRIP=strip)
    dx = pl.pallas_call(
        kern_x,
        grid=(p, h // strip),
        in_specs=[
            pl.BlockSpec((1, h + 2 * r, w + 2 * r), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(kernel * kernel),
                    pl.Element(slab_h),
                    pl.Element(w + 2 * r),
                ),
                lambda i, j: (i, 0, j * strip, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, strip, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((p, h, w), g_planes.dtype),
        interpret=interpret,
    )(g_pad, w_pad)

    kern_w = functools.partial(_stencil_bwd_w_kernel, K=kernel, W=w, STRIP=strip)
    dw = pl.pallas_call(
        kern_w,
        grid=(p, h // strip),
        in_specs=[
            pl.BlockSpec((1, h + 2 * r, w + 2 * r), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, strip, w), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, kernel * kernel, strip, w), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((p, kernel * kernel, h, w), g_planes.dtype),
        interpret=interpret,
    )(x_pad, g_planes)
    if h != h0:
        dx = dx[:, :h0]
        dw = dw[:, :, :h0]
    return dx, dw


# ---------------------------------------------------------------------------
# v2 kernel: channels-as-batch, W-in-lanes layout
#
# The NHWC layout puts C (= 24 latent channels) in the lane dimension — 24 of
# 128 lanes live, ~5x wasted VPU width. v2 instead runs one program per
# (batch, channel) plane with W in lanes (256 -> full width):
#   x:  (B*C, H+2r, W+2r)   whole padded plane in VMEM (~275 KB at 256²)
#   w:  (B*C, k², H, W)     streamed in row strips (dominant HBM traffic)
#   out:(B*C, H, W)
# Each (plane, strip) program does k² shifted multiply-accumulates on
# (strip, W) tiles. The weights tensor is read exactly once per step — the
# op's bandwidth lower bound.
# ---------------------------------------------------------------------------


def _stencil_kernel_v2(x_ref, w_ref, out_ref, *, K: int, W: int, STRIP: int):
    """x_ref: (1, H+2r, W+2r); w_ref: (1, K*K, STRIP, W); out_ref: (1, STRIP, W).

    Loads one sublane-aligned (STRIP+2r, W+2r) slab per program (STRIP is a
    multiple of 8 so ``j*STRIP`` is provably aligned), then applies the k²
    tap shifts as static in-register slices — Mosaic handles the sub-tile
    rotates, no unaligned vector loads."""
    j = pl.program_id(1)
    row0 = pl.multiple_of(j * STRIP, STRIP)
    r = K // 2
    slab = x_ref[0, pl.ds(row0, STRIP + 2 * r), :]  # (STRIP+2r, W+2r)
    acc = jnp.zeros((STRIP, W), jnp.float32)
    for t in range(K * K):
        dy, dx = t // K, t % K
        xs = slab[dy : dy + STRIP, dx : dx + W]
        acc = acc + xs.astype(jnp.float32) * w_ref[0, t].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def diffusion_step_pallas_v2(
    x_planes: jnp.ndarray, w_planes: jnp.ndarray, kernel: int, interpret: bool = False
) -> jnp.ndarray:
    """One stencil step in plane layout: x (P, H, W), w (P, k², H, W)."""
    p, h0, w = x_planes.shape
    h = _pad_rows_to8(h0)
    if h != h0:
        x_planes = jnp.pad(x_planes, ((0, 0), (0, h - h0), (0, 0)))
        w_planes = jnp.pad(w_planes, ((0, 0), (0, 0), (0, h - h0), (0, 0)))
    r = kernel // 2
    # fwd's dominant block: the (k², strip, w) weights tile
    strip = _aligned_strip(h, lambda s: kernel * kernel * s * w * 4)
    xp = jnp.pad(x_planes, ((0, 0), (r, r), (r, r)))
    kern = functools.partial(_stencil_kernel_v2, K=kernel, W=w, STRIP=strip)
    out = pl.pallas_call(
        kern,
        grid=(p, h // strip),
        in_specs=[
            pl.BlockSpec((1, h + 2 * r, w + 2 * r), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, kernel * kernel, strip, w), lambda i, j: (i, 0, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, strip, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((p, h, w), x_planes.dtype),
        interpret=interpret,
    )(xp, w_planes)
    return out if h == h0 else out[:, :h0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def diffusion_pallas_v2(
    x: jnp.ndarray, norm_weight: jnp.ndarray, kernel: int, steps: int, interpret: bool = False
) -> jnp.ndarray:
    """NHWC wrapper around the plane-layout kernel (backward = VJP of the
    identical jnp stencil math, like diffusion_pallas)."""
    b, h, w, c = x.shape
    xp = x.transpose(0, 3, 1, 2).reshape(b * c, h, w)
    wp = norm_weight.transpose(0, 3, 4, 1, 2).reshape(b * c, kernel * kernel, h, w)
    for _ in range(steps):
        xp = diffusion_step_pallas_v2(xp, wp, kernel, interpret=interpret)
    return xp.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def _diffusion_v2_fwd(x, norm_weight, kernel, steps, interpret):
    b, h, w, c = x.shape
    xp = x.transpose(0, 3, 1, 2).reshape(b * c, h, w)
    wp = norm_weight.transpose(0, 3, 4, 1, 2).reshape(b * c, kernel * kernel, h, w)
    step_inputs = []
    for _ in range(steps):
        step_inputs.append(xp)
        xp = diffusion_step_pallas_v2(xp, wp, kernel, interpret=interpret)
    out = xp.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    return out, (tuple(step_inputs), wp, (b, h, w, c))


def _diffusion_v2_bwd(kernel, steps, interpret, res, g):
    """Fused streaming backward: transpose-stencil dx + per-tap dw kernels."""
    step_inputs, wp, (b, h, w, c) = res
    gp = g.transpose(0, 3, 1, 2).reshape(b * c, h, w)
    dw = None
    for s in range(steps - 1, -1, -1):
        gx, gw = diffusion_step_bwd_pallas(gp, step_inputs[s], wp, kernel, interpret)
        dw = gw if dw is None else dw + gw
        gp = gx
    dx = gp.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    dnw = dw.reshape(b, c, kernel * kernel, h, w).transpose(0, 3, 4, 1, 2)
    return dx, dnw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def diffusion_pallas_v2_planes(
    x_planes: jnp.ndarray, w_planes: jnp.ndarray, kernel: int, steps: int, interpret: bool = False
) -> jnp.ndarray:
    """Plane-layout entry: x (P, H, W), w (P, k², H, W) normalized — NO
    NHWC<->plane transposes. At a 512² serving grid the NHWC wrapper's weight
    transpose alone moves ~0.6 GB (bf16, C=24, k=7) through HBM twice; the
    serving path emits planes straight from the affinity regressor
    (models/diffusion.py) and stays in this layout end-to-end."""
    for _ in range(steps):
        x_planes = diffusion_step_pallas_v2(x_planes, w_planes, kernel, interpret=interpret)
    return x_planes


def _diffusion_v2p_fwd(x_planes, w_planes, kernel, steps, interpret):
    step_inputs = []
    xp = x_planes
    for _ in range(steps):
        step_inputs.append(xp)
        xp = diffusion_step_pallas_v2(xp, w_planes, kernel, interpret=interpret)
    return xp, (tuple(step_inputs), w_planes)


def _diffusion_v2p_bwd(kernel, steps, interpret, res, gp):
    step_inputs, wp = res
    dw = None
    for s in range(steps - 1, -1, -1):
        gx, gw = diffusion_step_bwd_pallas(gp, step_inputs[s], wp, kernel, interpret)
        dw = gw if dw is None else dw + gw
        gp = gx
    return gp, dw


diffusion_pallas_v2_planes.defvjp(_diffusion_v2p_fwd, _diffusion_v2p_bwd)


def _reference_step(x: jnp.ndarray, norm_weight: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """jnp stencil step (same math as models.diffusion.message_passing_step)."""
    from ..utils.image import extract_patches

    patches = extract_patches(x, kernel, kernel // 2)
    return jnp.sum(patches * norm_weight, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def diffusion_pallas(
    x: jnp.ndarray,
    norm_weight: jnp.ndarray,
    kernel: int,
    steps: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """``steps`` iterations of the normalized-affinity stencil (fused taps).

    Forward runs the Pallas kernel; the backward pass is the exact VJP of the
    identical jnp stencil math (the op is a chain of linear-in-x weighted
    stencils), so gradients match the unfused reference."""
    wt = to_tap_major(norm_weight)
    for _ in range(steps):
        x = diffusion_step_pallas(x, wt, kernel, interpret=interpret)
    return x


def _diffusion_fwd(x, norm_weight, kernel, steps, interpret):
    out = diffusion_pallas(x, norm_weight, kernel, steps, interpret)
    return out, (x, norm_weight)


def _diffusion_bwd(kernel, steps, interpret, res, g):
    x, norm_weight = res

    def ref(x_, w_):
        y = x_
        for _ in range(steps):
            y = _reference_step(y, w_, kernel)
        return y

    _, vjp = jax.vjp(ref, x, norm_weight)
    return vjp(g)


diffusion_pallas.defvjp(_diffusion_fwd, _diffusion_bwd)
diffusion_pallas_v2.defvjp(_diffusion_v2_fwd, _diffusion_v2_bwd)
