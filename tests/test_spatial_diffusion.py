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


def test_spatial_diffusion_kernel1_pointwise():
    """kernel=1 (r=0) is pointwise: the halo machinery (x[:, -0:] slices,
    out[:, 0:-0]) would corrupt it — the short-circuit must produce
    x * w^steps per element, matching the unsharded reference."""
    from dgtd_tpu.models.diffusion import message_passing_step
    from dgtd_tpu.parallel.spatial import spatial_diffusion
    from dgtd_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 16, 8, 3), jnp.float32)
    w = jnp.asarray(rng.rand(2, 16, 8, 3, 1), jnp.float32)
    mesh = make_mesh(data=1, space=4, devices=jax.devices()[:4])
    out = spatial_diffusion(x, w, kernel=1, steps=2, mesh=mesh, use_pallas=False)
    ref = message_passing_step(message_passing_step(x, w, 1), w, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    assert out.shape == x.shape
