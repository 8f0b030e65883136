"""Golden forward regression anchor.

Pins the tiny-cod fp32 forward (fixed init + input seeds) so accidental
numerical changes to any layer (init schemes, resize semantics, diffusion,
decoder wiring) fail loudly in future rounds. Regenerate the constants ONLY
for intentional, documented numerics changes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dgtd_tpu.models import cod

GOLDEN_MEAN = 0.4795910120010376
GOLDEN_VALS = [
    0.4749671220779419, 0.501304566860199, 0.49597278237342834,
    0.45859411358833313, 0.4866999089717865, 0.48551613092422485,
    0.4615200161933899, 0.48193737864494324, 0.4751128554344177,
]


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
