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

GOLDEN_MEAN = 0.4795910120010376
GOLDEN_VALS = [
    0.4749671220779419, 0.501304566860199, 0.49597278237342834,
    0.45859411358833313, 0.4866999089717865, 0.48551613092422485,
    0.4615200161933899, 0.48193737864494324, 0.4751128554344177,
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


BF16_MEAN = 0.47958940267562866
BF16_VALS = [0.475118, 0.501404, 0.495728, 0.458834, 0.486758, 0.485539, 0.461988, 0.481941, 0.474875]


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


G704_MEAN = 0.49069273471832275
G704_VALS = [0.397803, 0.427295, 0.420601, 0.489198, 0.493529, 0.498013, 0.478109, 0.479438, 0.506847]


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
