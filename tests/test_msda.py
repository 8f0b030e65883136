"""Multi-scale deformable attention parity tests.

Mirrors the reference test matrix (/root/reference/twig/ops/test.py):
  * forward parity against the torch grid_sample oracle (the reference's own
    "fake backend", ms_deform_attn_func.py:49-71) — float rtol 1e-2/atol 1e-3
    like test.py:68, plus tight float32 tolerance for ref-vs-pallas;
  * gradient parity across the channel widths of test.py:108 (trimmed for
    CPU runtime) against torch autograd.

The Pallas kernel runs in interpret mode on CPU (real Mosaic compile is
exercised on TPU in bench/e2e paths).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dgtd_tpu.ops.msda import ms_deform_attn_pallas_fwd, ms_deform_attn_reference, make_ms_deform_attn

N, M, D = 1, 2, 2
LQ, P = 2, 2
SHAPES = ((6, 4), (3, 2))
S = sum(h * w for h, w in SHAPES)


def torch_oracle(value, shapes, sampling_locations, attention_weights):
    """grid_sample-based reference (reference ms_deform_attn_core_pytorch semantics)."""
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (n*m, lq, p, 2)
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    aw = attention_weights.transpose(1, 2).reshape(n * m, 1, lq, L * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1).view(n, m * d, lq)
    return out.transpose(1, 2).contiguous()


def make_inputs(channels=D, seed=3, lq=LQ):
    rng = np.random.RandomState(seed)
    value = rng.rand(N, S, M, channels).astype(np.float32) * 0.01
    loc = rng.rand(N, lq, M, len(SHAPES), P, 2).astype(np.float32)
    aw = rng.rand(N, lq, M, len(SHAPES), P).astype(np.float32) + 1e-5
    aw = aw / aw.sum(axis=(-1, -2), keepdims=True)
    return value, loc, aw


def test_reference_matches_torch_oracle():
    value, loc, aw = make_inputs()
    ours = np.asarray(ms_deform_attn_reference(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)))
    ref = torch_oracle(torch.from_numpy(value), SHAPES, torch.from_numpy(loc), torch.from_numpy(aw)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_reference_matches_torch_oracle_double():
    value, loc, aw = make_inputs(seed=7)
    with jax.enable_x64(True):
        ours = np.asarray(
            ms_deform_attn_reference(
                jnp.asarray(value, jnp.float64), SHAPES, jnp.asarray(loc, jnp.float64), jnp.asarray(aw, jnp.float64)
            )
        )
    ref = torch_oracle(
        torch.from_numpy(value).double(), SHAPES, torch.from_numpy(loc).double(), torch.from_numpy(aw).double()
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("channels", [2, 30, 32, 71, 1025, 3096])
def test_pallas_matches_reference(channels):
    value, loc, aw = make_inputs(channels, seed=11 + channels)
    ref = np.asarray(ms_deform_attn_reference(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)))
    ours = np.asarray(
        ms_deform_attn_pallas_fwd(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw), interpret=True
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


# channel widths follow the reference gradcheck matrix (twig/ops/test.py:108),
# including the >1k giants that hit the reference's multi_blocks/gm CUDA
# backward variants (ms_deform_im2col_cuda.cuh:923-1060) and our
# channel-block padding path — cheap enough in interpret mode (~10 s each at
# these tiny spatial/query sizes) to stay in the default suite; lq=2
# exercises heavy query-block padding (q_block=128), lq=150 multiple q blocks
@pytest.mark.parametrize(
    "channels,lq",
    [
        (2, 2),
        (30, 2),
        (32, 2),
        (64, 2),
        (71, 2),
        (16, 150),
        (1025, 2),
        (2048, 2),
    ],
)
def test_gradients_match_torch(channels, lq):
    value, loc, aw = make_inputs(channels, seed=23 + channels, lq=lq)

    op = make_ms_deform_attn(SHAPES, use_pallas=True, interpret=True)

    def loss_jax(v, l, a):
        return jnp.sum(op(v, l, a) ** 2)

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(aw).requires_grad_(True)
    loss = (torch_oracle(tv, SHAPES, tl, ta) ** 2).sum()
    loss.backward()
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_pallas_backward_matches_reference_vjp():
    """The fused dloc/daw kernel against the jnp reference VJP directly
    (independent of the torch oracle), at a 4-level detection-ish layout."""
    shapes = ((8, 8), (4, 4), (2, 2), (1, 1))
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(5)
    n, m, d, lq, p = 2, 2, 8, 37, 4
    value = jnp.asarray(rng.rand(n, s, m, d), jnp.float32)
    loc = jnp.asarray(rng.rand(n, lq, m, len(shapes), p, 2), jnp.float32)
    aw = jnp.asarray(rng.rand(n, lq, m, len(shapes), p), jnp.float32)
    g = jnp.asarray(rng.rand(n, lq, m * d), jnp.float32)

    from dgtd_tpu.ops.msda import ms_deform_attn_pallas_dlocw

    _, vjp = jax.vjp(
        lambda sl, a: ms_deform_attn_reference(value, shapes, sl, a), loc, aw
    )
    dl_ref, da_ref = vjp(g)
    dl, da = ms_deform_attn_pallas_dlocw(g, value, shapes, loc, aw, interpret=True)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref), rtol=1e-4, atol=1e-6)


def test_msdeformattn_module():
    """The working module wrapper (reference's is a 0-byte broken file)."""
    from dgtd_tpu.ops.msda import MSDeformAttn

    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    m = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2, use_pallas=True, interpret=True)
    rng = np.random.RandomState(0)
    query = jnp.asarray(rng.rand(1, 10, 32), jnp.float32)
    refs = jnp.asarray(rng.rand(1, 10, 2, 2), jnp.float32)
    value = jnp.asarray(rng.rand(1, s, 32), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), query, refs, value, shapes)
    out = m.apply(variables, query, refs, value, shapes)
    assert out.shape == (1, 10, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_locations_upcast_to_f32_coordinates():
    """Sampling coordinates must be computed in f32 even when the caller
    passes bf16 locations — at x≈0.8*W on a large level a bf16 coordinate
    has a multi-pixel ulp, which would quantize the bilinear fractions.
    The op's output with bf16 locations must match the f32 result to bf16
    input-rounding tolerance (NOT collapse to whole-pixel samples)."""
    from dgtd_tpu.ops.msda import make_ms_deform_attn

    rng = np.random.RandomState(11)
    shapes = ((64, 100),)
    B, H, D, Lq, P = 1, 2, 8, 9, 4
    total = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.rand(B, total, H, D), jnp.float32)
    # locations clustered near the right edge where bf16 ulp is largest
    sl = 0.85 + 0.1 * rng.rand(B, Lq, H, len(shapes), P, 2)
    aw = rng.rand(B, Lq, H, len(shapes), P)
    aw /= aw.sum(axis=(-2, -1), keepdims=True)
    op = make_ms_deform_attn(shapes, use_pallas=False)

    out32 = np.asarray(op(value, jnp.asarray(sl, jnp.float32), jnp.asarray(aw, jnp.float32)))
    out16 = np.asarray(op(value, jnp.asarray(sl, jnp.bfloat16), jnp.asarray(aw, jnp.bfloat16)))
    # exact contract of the upcast: bf16 inputs == f32 math on the
    # bf16-ROUNDED values (the input rounds once; the coordinate/fraction
    # arithmetic itself stays f32)
    sl_r = np.asarray(jnp.asarray(sl, jnp.bfloat16), np.float32)
    aw_r = np.asarray(jnp.asarray(aw, jnp.bfloat16), np.float32)
    want = np.asarray(op(value, jnp.asarray(sl_r), jnp.asarray(aw_r)))
    np.testing.assert_allclose(out16, want, rtol=1e-6, atol=1e-6)
    # input rounding moves samples < 0.5 px: error stays far below the
    # order-1 whole-pixel displacement bf16 coordinate MATH would cause
    assert np.abs(out16 - out32).max() < 0.2
    # grads flow at the caller's dtypes
    g = jax.grad(lambda s: jnp.sum(op(value, s, jnp.asarray(aw, jnp.bfloat16))))(
        jnp.asarray(sl, jnp.bfloat16)
    )
    assert g.dtype == jnp.bfloat16 and bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_bf16_value_gradients_both_paths():
    """Code-review r4 finding 2 (live-verified): the output dtype cast to
    value.dtype must be applied INSIDE the bwd vjp's primal too — uncast,
    a bf16 cotangent against the f32 reference primal raised at trace time
    on the non-pallas path. Both paths must accept bf16 values end to end
    and produce bf16 outputs + grads."""
    value, loc, aw = make_inputs()
    v16 = jnp.asarray(value, jnp.bfloat16)
    for use_pallas in (False, True):
        op = make_ms_deform_attn(SHAPES, use_pallas=use_pallas, interpret=use_pallas)
        out = op(v16, jnp.asarray(loc), jnp.asarray(aw))
        assert out.dtype == jnp.bfloat16, (use_pallas, out.dtype)

        def loss(v, s, a):
            return jnp.sum(op(v, s, a).astype(jnp.float32) ** 2)

        dv, dsl, daw = jax.grad(loss, argnums=(0, 1, 2))(
            v16, jnp.asarray(loc), jnp.asarray(aw)
        )
        assert dv.dtype == jnp.bfloat16, (use_pallas, dv.dtype)
        assert np.isfinite(np.asarray(dv, np.float32)).all()
        assert float(jnp.abs(dv.astype(jnp.float32)).max()) > 0
