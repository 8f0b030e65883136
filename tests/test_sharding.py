"""Multi-device sharding correctness on the virtual CPU mesh.

Validates the TPU-native parallelism claims (SURVEY.md §2.9): batch ('data')
sharding reproduces single-device numerics, and the 2-D ('data','space')
layout — spatial H sharding for the high-res serving config — also agrees,
with XLA inserting the halo/collective traffic for convs, resizes and FFT.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgtd_tpu.models import cod
from dgtd_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


@pytest.fixture(scope="module")
def tiny_model():
    m = cod(
        dtype=jnp.float32,
        variant="b0",
        convnext_dims=(16, 32, 64, 128),
        convnext_depths=(1, 1, 2, 1),
    )
    v = m.init(jax.random.PRNGKey(0), (1, 48, 48, 3))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(4, 48, 48, 3), jnp.float32)
    dep = jnp.asarray(rng.rand(4, 48, 48, 1), jnp.float32)
    ref = np.asarray(m.predict(v, img, dep)[0])
    return m, v, img, dep, ref


@pytest.mark.parametrize("data,space", [(4, 1), (2, 2), (1, 4)])
def test_sharded_predict_matches_single_device(tiny_model, data, space):
    m, v, img, dep, ref = tiny_model
    mesh = make_mesh(data=data, space=space, devices=jax.devices()[: data * space])
    sh = batch_sharding(mesh)
    v_r = jax.device_put(v, replicated(mesh))
    img_s = jax.device_put(img, sh)
    dep_s = jax.device_put(dep, sh)

    @jax.jit
    def predict(v, im, d):
        return m.predict(v, im, d)[0]

    out = np.asarray(predict(v_r, img_s, dep_s))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
