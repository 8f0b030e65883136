"""shard_map spatially-sharded diffusion vs the unsharded reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgtd_tpu.models.diffusion import message_passing_step, normalize_affinity
from dgtd_tpu.parallel.mesh import make_mesh
from dgtd_tpu.parallel.spatial import spatial_diffusion


@pytest.mark.parametrize("space,k,steps", [(4, 7, 3), (2, 3, 6), (8, 7, 2)])
@pytest.mark.slow
def test_spatial_diffusion_matches_reference(space, k, steps):
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 32, 16, 6
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    nw = normalize_affinity(jnp.asarray(rng.rand(b, h, w, c, k * k), jnp.float32))

    ref = x
    for _ in range(steps):
        ref = message_passing_step(ref, nw, k)

    mesh = make_mesh(data=1, space=space, devices=jax.devices()[:space])
    out = spatial_diffusion(x, nw, k, steps, mesh, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_spatial_diffusion_pallas_interpret():
    """Per-shard Pallas kernel path (interpret mode) under shard_map."""
    rng = np.random.RandomState(1)
    b, h, w, c, k, steps, space = 1, 32, 16, 4, 7, 2, 2
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    nw = normalize_affinity(jnp.asarray(rng.rand(b, h, w, c, k * k), jnp.float32))
    ref = x
    for _ in range(steps):
        ref = message_passing_step(ref, nw, k)
    mesh = make_mesh(data=1, space=space, devices=jax.devices()[:space])
    out = spatial_diffusion(x, nw, k, steps, mesh, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
