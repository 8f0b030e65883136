"""Multi-scale deformable attention — TPU-native equivalent of the
reference's CUDA extension.

Reference surface (/root/reference/twig/ops/): pybind11 module exposing
``ms_deform_attn_forward/backward`` (src/vision.cpp:13-16) around CUDA
im2col/col2im kernels (src/cuda/ms_deform_im2col_cuda.cuh), a pure-PyTorch
``grid_sample`` reference (functions/ms_deform_attn_func.py:49-71), and a
fwd-parity + gradcheck test matrix (test.py:104-109). The op is NOT used by
the main cod path (SURVEY.md §2.4) but is part of the repo surface.

Tensor contract (reference parity):
  value:              (N, S, M, D)  — S = sum(H_l * W_l)
  spatial_shapes:     static list/tuple of (H_l, W_l)
  sampling_locations: (N, Lq, M, L, P, 2) in [0, 1] (x, y)
  attention_weights:  (N, Lq, M, L, P)
  output:             (N, Lq, M * D)

Bilinear sampling follows ``F.grid_sample(align_corners=False,
padding_mode='zeros')``: src = loc * size - 0.5, out-of-range corners
contribute zero.

TPU design: gathers map poorly to the VPU, so the Pallas kernel rebuilds the
bilinear sample as a 4-nonzero one-hot matrix over the flattened spatial axis
contracted against the value plane on the MXU; the one-hot construction is
pure VPU compares against an iota. Measured on v5e at detection scale
(N2 M8 D32 P4 Lq5440, 4 levels): 9.8 ms vs 62.5 ms for the XLA gather
reference — 6.4x. The backward is fully fused Pallas too: dValue as the
one-hot-TRANSPOSE matmul (the CUDA col2im atomicAdd path,
ms_deform_im2col_cuda.cuh:301-921, 5.7x over the XLA scatter) and
dLocation/dAttentionWeight as three extra MXU matmuls per point against the
same one-hot factors (see the dlocw kernel header below); grads match the
jnp reference VJP exactly (tests/test_msda.py).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl


# ---------------------------------------------------------------------------
# Pure-jnp reference (the "fake backend" — ms_deform_attn_func.py:49-71 parity)
# ---------------------------------------------------------------------------


def _split_levels(value: jnp.ndarray, spatial_shapes) -> list:
    sizes = [int(h) * int(w) for h, w in spatial_shapes]
    offsets = np.cumsum([0] + sizes[:-1])
    return [
        lax.slice_in_dim(value, int(o), int(o) + s, axis=1)
        for o, s in zip(offsets, sizes)
    ]


def _bilinear_sample_zeros(value_hw: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=False, padding zeros) on (H, W, D) at float
    pixel coords x (W-axis), y (H-axis) of shape (...,). Returns (..., D)."""
    h, w, d = value_hw.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    out = 0.0
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            v = value_hw[yc, xc]  # gather (..., D)
            out = out + v * (wx * wy * valid)[..., None]
    return out


def ms_deform_attn_reference(
    value: jnp.ndarray,
    spatial_shapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Gather-based jnp implementation (differentiable; grads = scatter-add)."""
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = sampling_locations.shape
    levels = _split_levels(value, spatial_shapes)
    out = jnp.zeros((n, lq, m, d), value.dtype)
    for lid, (hl, wl) in enumerate(spatial_shapes):
        hl, wl = int(hl), int(wl)
        v = levels[lid].reshape(n, hl, wl, m, d).transpose(0, 3, 1, 2, 4)  # (N,M,H,W,D)
        loc = sampling_locations[:, :, :, lid]  # (N, Lq, M, P, 2)
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        # vmap over batch and head
        def sample_one(v_hw, xq, yq):
            return _bilinear_sample_zeros(v_hw, xq, yq)  # (Lq, P, D)

        sampled = jax.vmap(  # over N
            jax.vmap(sample_one, in_axes=(0, 1, 1), out_axes=1),  # over M
            in_axes=(0, 0, 0),
        )(v, x.transpose(0, 1, 2, 3), y)  # (N, Lq, M, P, D)
        w = attention_weights[:, :, :, lid]  # (N, Lq, M, P)
        out = out + jnp.sum(sampled * w[..., None], axis=3)
    return out.reshape(n, lq, m * d)


# ---------------------------------------------------------------------------
# Pallas TPU kernel: one-hot interpolation matmuls (MXU path)
# ---------------------------------------------------------------------------


def _msda_level_kernel(v_ref, x_ref, y_ref, w_ref, acc_in_ref, out_ref, *, H, W, D, P):
    """One (batch*head, q_block) program: accumulate P weighted bilinear
    samples from a (H*W, D) value plane.

    The bilinear gather is expressed as a 4-nonzero one-hot matrix over the
    flattened spatial axis (built with pure VPU iota compares) contracted
    against the value plane on the MXU — no gathers, no vector reshapes.

    v_ref: (1, H*W, D); x/y/w_ref: (1, P, QB); acc_in/out_ref: (1, QB, D).
    """
    v = v_ref[0]  # (H*W, D)
    qb = out_ref.shape[1]
    acc = jnp.zeros((qb, D), jnp.float32)
    hw_iota = lax.broadcasted_iota(jnp.int32, (qb, H * W), 1)
    hi = hw_iota // W
    wi = hw_iota % W
    for p_idx in range(P):
        x = x_ref[0, p_idx, :]  # (QB,)
        y = y_ref[0, p_idx, :]
        aw = w_ref[0, p_idx, :]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        x0i = x0.astype(jnp.int32)[:, None]
        y0i = y0.astype(jnp.int32)[:, None]
        # separable one-hot factors over the flat axis; out-of-range corners
        # never match the iota so zero-padding falls out automatically
        ry = jnp.where(hi == y0i, 1.0 - fy, 0.0) + jnp.where(hi == y0i + 1, fy, 0.0)
        cx = jnp.where(wi == x0i, 1.0 - fx, 0.0) + jnp.where(wi == x0i + 1, fx, 0.0)
        onehot = ry * cx * aw[:, None]  # (QB, H*W), 4 nonzeros per row
        # HIGHEST: default MXU precision rounds f32 inputs to bf16 passes
        # (~1e-3 rel grad noise vs the full-f32 CUDA reference semantics)
        acc = acc + jnp.dot(
            onehot, v, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[0] = acc_in_ref[0] + acc.astype(out_ref.dtype)


def _to_npq(a, n, m, p, lq, lq_pad):
    """(N, Lq, M, P) -> (N*M, P, Lq_pad) query-padded kernel layout."""
    a = a.transpose(0, 2, 3, 1).reshape(n * m, p, lq)
    return jnp.pad(a, ((0, 0), (0, 0), (0, lq_pad - lq)))


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def ms_deform_attn_pallas_fwd(
    value, spatial_shapes, sampling_locations, attention_weights, q_block: int = 128,
    interpret: bool = False,
):
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = sampling_locations.shape
    levels = _split_levels(value, spatial_shapes)
    lq_pad = _round_up(lq, q_block)

    out = jnp.zeros((n * m, lq_pad, d), jnp.float32)
    for lid, (hl, wl) in enumerate(spatial_shapes):
        hl, wl = int(hl), int(wl)
        v = (
            levels[lid]
            .reshape(n, hl * wl, m, d)
            .transpose(0, 2, 1, 3)
            .reshape(n * m, hl * wl, d)
        )
        loc = sampling_locations[:, :, :, lid]  # (N, Lq, M, P, 2)
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        w = attention_weights[:, :, :, lid]  # (N, Lq, M, P)
        xq, yq, wq = (_to_npq(a, n, m, p, lq, lq_pad) for a in (x, y, w))
        # out-of-image coords for padded queries: weight 0 keeps them inert

        kernel = functools.partial(_msda_level_kernel, H=hl, W=wl, D=d, P=p)
        out = pl.pallas_call(
            kernel,
            grid=(n * m, lq_pad // q_block),
            in_specs=[
                pl.BlockSpec((1, hl * wl, d), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, p, q_block), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, p, q_block), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, p, q_block), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((n * m, lq_pad, d), jnp.float32),
            input_output_aliases={4: 0},
            interpret=interpret,
        )(v, xq, yq, wq, out)
    out = out[:, :lq].reshape(n, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(n, lq, m * d).astype(value.dtype)


# ---------------------------------------------------------------------------
# Pallas backward: dValue as one-hot-transpose matmuls
#
# The value gradient is the reference backward's scatter-add (the CUDA
# col2im's atomicAdd path) — here it is the TRANSPOSE of the forward's
# one-hot contraction: dV = Σ_p onehotᵀ (HW, QB) @ g (QB, D), accumulated
# across query blocks by revisiting the output block over the sequential TPU
# grid. Location/weight grads stay on the (cheap, gather-sized) reference VJP.
# ---------------------------------------------------------------------------


def _msda_dvalue_kernel(x_ref, y_ref, w_ref, g_ref, out_ref, *, H, W, D, P):
    """x/y/w_ref: (1, P, QB); g_ref: (1, QB, D); out_ref: (1, H*W, D)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    qb = g_ref.shape[1]
    g = g_ref[0].astype(jnp.float32)  # (QB, D)
    hw_iota = lax.broadcasted_iota(jnp.int32, (qb, H * W), 1)
    hi = hw_iota // W
    wi = hw_iota % W
    acc = jnp.zeros((H * W, D), jnp.float32)
    for p_idx in range(P):
        x = x_ref[0, p_idx, :]
        y = y_ref[0, p_idx, :]
        aw = w_ref[0, p_idx, :]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        x0i = x0.astype(jnp.int32)[:, None]
        y0i = y0.astype(jnp.int32)[:, None]
        ry = jnp.where(hi == y0i, 1.0 - fy, 0.0) + jnp.where(hi == y0i + 1, fy, 0.0)
        cx = jnp.where(wi == x0i, 1.0 - fx, 0.0) + jnp.where(wi == x0i + 1, fx, 0.0)
        onehot = ry * cx * aw[:, None]  # (QB, H*W)
        acc = acc + jax.lax.dot_general(
            onehot, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # onehotᵀ @ g -> (H*W, D)
    out_ref[0] = out_ref[0] + acc.astype(out_ref.dtype)


def ms_deform_attn_pallas_dvalue(
    g, value_shape_info, spatial_shapes, sampling_locations, attention_weights,
    q_block: int = 128, interpret: bool = False,
):
    """dL/dValue. g: (N, Lq, M*D); returns (N, S, M, D)."""
    n, s, m, d = value_shape_info
    _, lq, _, L, p, _ = sampling_locations.shape
    lq_pad = _round_up(lq, q_block)
    g_planes = g.reshape(n, lq, m, d).transpose(0, 2, 1, 3).reshape(n * m, lq, d)
    g_planes = jnp.pad(g_planes, ((0, 0), (0, lq_pad - lq), (0, 0)))

    level_grads = []
    for lid, (hl, wl) in enumerate(spatial_shapes):
        hl, wl = int(hl), int(wl)
        loc = sampling_locations[:, :, :, lid]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        w = attention_weights[:, :, :, lid]

        xq, yq, wq = (_to_npq(a, n, m, p, lq, lq_pad) for a in (x, y, w))
        kernel = functools.partial(_msda_dvalue_kernel, H=hl, W=wl, D=d, P=p)
        dv = pl.pallas_call(
            kernel,
            grid=(n * m, lq_pad // q_block),
            in_specs=[
                pl.BlockSpec((1, p, q_block), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, p, q_block), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, p, q_block), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, hl * wl, d), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n * m, hl * wl, d), jnp.float32),
            interpret=interpret,
        )(xq, yq, wq, g_planes)
        level_grads.append(dv)
    dv_all = jnp.concatenate(level_grads, axis=1)  # (N*M, S, D)
    return dv_all.reshape(n, m, s, d).transpose(0, 2, 1, 3).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas backward: dLocation / dAttentionWeight
#
# The reference CUDA backward fuses these with the value grad in col2im
# (ms_deform_im2col_cuda.cuh:301-921 — its 5 shm-reduction variants exist
# because the per-sample weight/location grads need cross-channel
# reductions). Here each is three extra MXU matmuls per point against the
# SAME one-hot factors the forward builds:
#   s    = (ry·cx)          @ V   -> daw = Σ_d s ⊙ g
#   ds/dx = (ry·∂cx)        @ V   -> dx  = aw · Σ_d ds/dx ⊙ g · W_l
#   ds/dy = (∂ry·cx)        @ V   -> dy  = aw · Σ_d ds/dy ⊙ g · H_l
# with ∂cx = 1[wi==x0+1] − 1[wi==x0] (the fractional weight's derivative);
# out-of-range corners never match the iota, reproducing grid_sample's
# zero-padding gradient exactly.
# ---------------------------------------------------------------------------


def _msda_dlocw_kernel(
    v_ref, x_ref, y_ref, w_ref, g_ref, dx_ref, dy_ref, dw_ref, *, H, W, D, P
):
    """v_ref: (1, H*W, D); x/y/w_ref: (1, P, QB); g_ref: (1, QB, D);
    dx/dy/dw_ref: (1, P, QB)."""
    v = v_ref[0]  # (H*W, D)
    g = g_ref[0].astype(jnp.float32)  # (QB, D)
    qb = g_ref.shape[1]
    hw_iota = lax.broadcasted_iota(jnp.int32, (qb, H * W), 1)
    hi = hw_iota // W
    wi = hw_iota % W
    for p_idx in range(P):
        x = x_ref[0, p_idx, :]
        y = y_ref[0, p_idx, :]
        aw = w_ref[0, p_idx, :]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        x0i = x0.astype(jnp.int32)[:, None]
        y0i = y0.astype(jnp.int32)[:, None]
        is_y0 = hi == y0i
        is_y1 = hi == y0i + 1
        is_x0 = wi == x0i
        is_x1 = wi == x0i + 1
        ry = jnp.where(is_y0, 1.0 - fy, 0.0) + jnp.where(is_y1, fy, 0.0)
        cx = jnp.where(is_x0, 1.0 - fx, 0.0) + jnp.where(is_x1, fx, 0.0)
        ryd = jnp.where(is_y1, 1.0, 0.0) - jnp.where(is_y0, 1.0, 0.0)
        cxd = jnp.where(is_x1, 1.0, 0.0) - jnp.where(is_x0, 1.0, 0.0)

        def rowdot(mat):  # (QB, H*W) @ (H*W, D) then ⊙g reduce -> (QB,)
            s = jnp.dot(
                mat, v, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.sum(s * g, axis=1)

        dw_ref[0, p_idx, :] = rowdot(ry * cx)
        dx_ref[0, p_idx, :] = aw * rowdot(ry * cxd)
        dy_ref[0, p_idx, :] = aw * rowdot(ryd * cx)


def ms_deform_attn_pallas_dlocw(
    g, value, spatial_shapes, sampling_locations, attention_weights,
    q_block: int = 128, interpret: bool = False,
):
    """dL/d(sampling_locations), dL/d(attention_weights).

    g: (N, Lq, M*D). Returns (dloc (N,Lq,M,L,P,2) f32, daw (N,Lq,M,L,P) f32).
    """
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = sampling_locations.shape
    lq_pad = _round_up(lq, q_block)
    levels = _split_levels(value, spatial_shapes)
    g_planes = g.reshape(n, lq, m, d).transpose(0, 2, 1, 3).reshape(n * m, lq, d)
    g_planes = jnp.pad(g_planes, ((0, 0), (0, lq_pad - lq), (0, 0))).astype(jnp.float32)

    dx_levels, dy_levels, dw_levels = [], [], []
    for lid, (hl, wl) in enumerate(spatial_shapes):
        hl, wl = int(hl), int(wl)
        v = (
            levels[lid]
            .reshape(n, hl * wl, m, d)
            .transpose(0, 2, 1, 3)
            .reshape(n * m, hl * wl, d)
            .astype(jnp.float32)
        )
        loc = sampling_locations[:, :, :, lid]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        w = attention_weights[:, :, :, lid]

        xq, yq, wq = (_to_npq(a, n, m, p, lq, lq_pad) for a in (x, y, w))
        kernel = functools.partial(_msda_dlocw_kernel, H=hl, W=wl, D=d, P=p)
        pq_spec = pl.BlockSpec((1, p, q_block), lambda i, j: (i, 0, j))
        dx, dy, dw = pl.pallas_call(
            kernel,
            grid=(n * m, lq_pad // q_block),
            in_specs=[
                pl.BlockSpec((1, hl * wl, d), lambda i, j: (i, 0, 0)),
                pq_spec,
                pq_spec,
                pq_spec,
                pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0)),
            ],
            out_specs=[pq_spec, pq_spec, pq_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n * m, p, lq_pad), jnp.float32)
                for _ in range(3)
            ],
            interpret=interpret,
        )(v, xq, yq, wq, g_planes)

        def from_npq(a):  # (N*M, P, Lq_pad) -> (N, Lq, M, P)
            return a[:, :, :lq].reshape(n, m, p, lq).transpose(0, 3, 1, 2)

        # chain through x = loc_x * W_l - 0.5 / y = loc_y * H_l - 0.5
        dx_levels.append(from_npq(dx) * wl)
        dy_levels.append(from_npq(dy) * hl)
        dw_levels.append(from_npq(dw))

    dloc = jnp.stack(
        [jnp.stack(dx_levels, axis=3), jnp.stack(dy_levels, axis=3)], axis=-1
    )  # (N, Lq, M, L, P, 2)
    daw = jnp.stack(dw_levels, axis=3)  # (N, Lq, M, L, P)
    return dloc, daw


# ---------------------------------------------------------------------------
# public op with custom VJP (backward via the reference math)
# ---------------------------------------------------------------------------


def make_ms_deform_attn(
    spatial_shapes,
    use_pallas: bool = True,
    interpret: bool = False,
    pallas_backward: bool = True,
):
    """Build the op for a static level layout (shapes are compile-time).

    ``pallas_backward``: compute the FULL gradient triple with the Pallas
    kernels — dValue via the one-hot-transpose kernel, dLocation and
    dAttentionWeight via the 3-matmuls-per-point kernel; with it off, all
    three come from the reference VJP.

    Sampling coordinates and attention weights are upcast to f32 at the op
    boundary regardless of the activation dtype: under bf16 a coordinate
    like x=800 has a ulp of 4 PIXELS, which would quantize the bilinear
    fractions to garbage. This matches the f32 CUDA reference semantics;
    gradients are cast back to the caller's dtypes."""

    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)

    @jax.custom_vjp
    def op(value, sampling_locations, attention_weights):
        sl = sampling_locations.astype(jnp.float32)
        aw = attention_weights.astype(jnp.float32)
        if use_pallas:
            return ms_deform_attn_pallas_fwd(
                value, shapes, sl, aw, interpret=interpret
            )
        # cast back to the activation dtype: the f32 sl/aw upcast otherwise
        # promotes a bf16 value's output to f32, doubling its HBM traffic
        # (the pallas fwd already returns value.dtype)
        return ms_deform_attn_reference(value, shapes, sl, aw).astype(value.dtype)

    def fwd(value, sampling_locations, attention_weights):
        return op(value, sampling_locations, attention_weights), (
            value,
            sampling_locations,
            attention_weights,
        )

    def bwd(res, g):
        value, sl0, aw0 = res
        sl = sl0.astype(jnp.float32)
        aw = aw0.astype(jnp.float32)
        if use_pallas and pallas_backward:
            dv = ms_deform_attn_pallas_dvalue(
                g, value.shape, shapes, sl, aw, interpret=interpret
            ).astype(value.dtype)
            dsl, daw = ms_deform_attn_pallas_dlocw(
                g, value, shapes, sl, aw, interpret=interpret
            )
            return dv, dsl.astype(sl0.dtype), daw.astype(aw0.dtype)
        _, vjp = jax.vjp(
            # same output cast as the forward: the cotangent g arrives in
            # value.dtype, so the vjp's primal output dtype must match it
            # (uncast, a bf16 g against an f32 primal raises at trace time)
            lambda v, s, a: ms_deform_attn_reference(v, shapes, s, a).astype(
                value.dtype
            ),
            value,
            sl,
            aw,
        )
        dv, dsl, daw = vjp(g)
        return dv.astype(value.dtype), dsl.astype(sl0.dtype), daw.astype(aw0.dtype)

    op.defvjp(fwd, bwd)
    return op


def ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights,
                   use_pallas: bool = True, interpret: bool = False):
    op = make_ms_deform_attn(spatial_shapes, use_pallas=use_pallas, interpret=interpret)
    return op(value, sampling_locations, attention_weights)


class MSDeformAttn:
    """Deformable-DETR attention layer over the TPU op.

    The reference's module wrapper is broken surface — ``twig/ops/modules/
    ms_deform_attn.py`` is a 0-byte file whose import fails (SURVEY.md §2.4).
    This is the working equivalent: query-conditioned sampling offsets and
    attention weights (softmax over levels×points) around the kernel. Flax
    module defined lazily to keep ops import-light."""

    def __new__(cls, *args, **kwargs):
        return _build_msda_module()(*args, **kwargs)


def _build_msda_module():
    import flax.linen as nn

    class _MSDeformAttn(nn.Module):
        d_model: int = 256
        n_levels: int = 4
        n_heads: int = 8
        n_points: int = 4
        use_pallas: bool = True
        interpret: bool = False

        @nn.compact
        def __call__(self, query, reference_points, value, spatial_shapes):
            """query (N, Lq, C); reference_points (N, Lq, L, 2) in [0,1];
            value (N, S, C); spatial_shapes static ((H,W),...)."""
            n, lq, c = query.shape
            m, L, p = self.n_heads, self.n_levels, self.n_points
            value_proj = nn.Dense(self.d_model, name="value_proj")(value)
            value_proj = value_proj.reshape(n, -1, m, self.d_model // m)
            offsets = nn.Dense(m * L * p * 2, name="sampling_offsets")(query)
            offsets = offsets.reshape(n, lq, m, L, p, 2)
            weights = nn.Dense(m * L * p, name="attention_weights")(query)
            weights = jax.nn.softmax(
                weights.reshape(n, lq, m, L * p), axis=-1
            ).reshape(n, lq, m, L, p)
            norm = jnp.asarray(
                [[wl, hl] for hl, wl in spatial_shapes], jnp.float32
            )  # (L, 2) in (x, y) order
            locations = (
                reference_points[:, :, None, :, None, :]
                + offsets / norm[None, None, None, :, None, :]
            )
            out = ms_deform_attn(
                value_proj, spatial_shapes, locations, weights,
                use_pallas=self.use_pallas, interpret=self.interpret,
            )
            return nn.Dense(self.d_model, name="output_proj")(out)

    return _MSDeformAttn
