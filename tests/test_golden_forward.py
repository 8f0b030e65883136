"""Golden forward regression anchor.

Pins the tiny-cod fp32 forward (fixed init + input seeds) so accidental
numerical changes to any layer (init schemes, resize semantics, diffusion,
decoder wiring) fail loudly in future rounds. Regenerate the constants ONLY
for intentional, documented numerics changes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgtd_tpu.models import cod

GOLDEN_MEAN = 0.4798423945903778  # regenerated: grouped-conv fan_out init fix (pvt scheme, groups divide)
GOLDEN_VALS = [
    0.4748946, 0.50124, 0.4959441,
    0.4586775, 0.4870072, 0.4858848,
    0.461611, 0.4823306, 0.4755223,
]


@pytest.mark.slow
def test_tiny_cod_forward_is_pinned():
    m = cod(dtype=jnp.float32, variant="b0", convnext_dims=(16, 32, 64, 128), convnext_depths=(1, 1, 2, 1))
    v = m.init(jax.random.PRNGKey(42), (1, 48, 48, 3))
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(1, 48, 48, 3), jnp.float32)
    dep = jnp.asarray(rng.rand(1, 48, 48, 1), jnp.float32)
    prob, _ = m.predict(v, img, dep)
    p = np.asarray(prob)
    np.testing.assert_allclose(float(p.mean()), GOLDEN_MEAN, rtol=1e-5)
    np.testing.assert_allclose(p[0, ::16, ::16, 0].ravel(), GOLDEN_VALS, rtol=1e-5)


BF16_MEAN = 0.47986719012260437
BF16_VALS = [0.4751182, 0.5014038, 0.4951174, 0.4588337, 0.4870634, 0.4857217, 0.4617448, 0.4824291, 0.4756053]


@pytest.mark.slow
def test_tiny_cod_forward_is_pinned_bf16():
    """bf16 compute-policy anchor (the serving dtype); looser tolerance for
    accumulation-order freedom across compiler versions."""
    m = cod(dtype=jnp.bfloat16, variant="b0", convnext_dims=(16, 32, 64, 128), convnext_depths=(1, 1, 2, 1))
    v = m.init(jax.random.PRNGKey(42), (1, 48, 48, 3))
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(1, 48, 48, 3), jnp.float32)
    dep = jnp.asarray(rng.rand(1, 48, 48, 1), jnp.float32)
    p = np.asarray(m.predict(v, img, dep)[0])
    np.testing.assert_allclose(float(p.mean()), BF16_MEAN, atol=2e-3)
    np.testing.assert_allclose(p[0, ::16, ::16, 0].ravel(), BF16_VALS, atol=1e-2)
    # bf16 must track the fp32 anchor closely at the probability surface
    np.testing.assert_allclose(float(p.mean()), GOLDEN_MEAN, atol=2e-3)


G704_MEAN = 0.4907383322715759
G704_VALS = [0.3977944, 0.4273128, 0.4206501, 0.4892588, 0.4935503, 0.4980638, 0.4781433, 0.4795446, 0.5068622]


@pytest.mark.slow
def test_tiny_cod_704_eval_resolution_is_pinned():
    """704² — the COD_TEST/CHAMELEON/NC4K eval resolution — golden anchor
    (tiny variant so the CPU compile stays tractable)."""
    m = cod(dtype=jnp.float32, variant="tiny", channel=8, latent_dim=8, grid=8,
            refine_iters=1, convnext_dims=(8, 16, 32, 64), convnext_depths=(1, 1, 1, 1))
    v = m.init(jax.random.PRNGKey(3), (1, 704, 704, 3))
    img = jnp.asarray(np.random.RandomState(11).rand(1, 704, 704, 3), jnp.float32)
    dep = jnp.asarray(np.random.RandomState(12).rand(1, 704, 704, 1), jnp.float32)
    p = np.asarray(m.predict(v, img, dep)[0])
    assert p.shape == (1, 704, 704, 1)
    np.testing.assert_allclose(float(p.mean()), G704_MEAN, rtol=1e-5)
    np.testing.assert_allclose(p[0, ::256, ::256, 0].ravel(), G704_VALS, atol=1e-5)


@pytest.mark.slow
def test_full_b2_predict_lowers_at_704():
    """Real-shape pin at the CAMO/CHAMELEON/NC4K benchmark bucket for the
    FULL flagship (PVTv2-b2 + ConvNeXt-B): predict traces and lowers at 704²
    (no CPU compile/execute — unaffordable in-suite; the chip runs this size
    in tools/serving_check.py). The reference model CRASHES at this size —
    its own datasets' resolution — because MessagePassing pins img_size=384
    (cod.py:1252; PARITY.md delta 15). Note the TPU pallas diffusion path is
    backend-gated at trace time, so this lowers the XLA fallback — the
    pallas lowering at serving widths is pinned by tests/test_spatial_diffusion.py
    and the on-chip serving_check."""
    m = cod(dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda r: m.net.init(
            {"params": r},
            jnp.zeros((1, 704, 704, 3)),
            jnp.zeros((1, 704, 704, 1)),
            train=False,
        ),
        jax.random.PRNGKey(0),
    )
    vars_s = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
    img = jax.ShapeDtypeStruct((1, 704, 704, 3), jnp.float32)
    dep = jax.ShapeDtypeStruct((1, 704, 704, 1), jnp.float32)
    out = jax.eval_shape(lambda v, i, d: m.predict(v, i, d)[0], vars_s, img, dep)
    assert out.shape == (1, 704, 704, 1), out.shape
    lowered = jax.jit(lambda v, i, d: m.predict(v, i, d)[0]).lower(vars_s, img, dep)
    assert "704" in lowered.as_text()[:100000]
