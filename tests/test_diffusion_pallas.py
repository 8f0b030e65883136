"""Pallas diffusion stencil vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dgtd_tpu.models.diffusion import message_passing_step, normalize_affinity
from dgtd_tpu.ops.diffusion_pallas import diffusion_pallas, to_tap_major


@pytest.mark.parametrize("k,steps,h,c", [(7, 4, 16, 8), (3, 6, 12, 24), (7, 2, 24, 8)])
def test_diffusion_pallas_matches_reference(k, steps, h, c):
    rng = np.random.RandomState(0)
    b, w = 2, h
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    raw_w = jnp.asarray(rng.rand(b, h, w, c, k * k), jnp.float32)
    nw = normalize_affinity(raw_w)

    ref = x
    for _ in range(steps):
        ref = message_passing_step(ref, nw, k)

    out = diffusion_pallas(x, nw, k, steps, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_tap_major_layout():
    rng = np.random.RandomState(1)
    nw = jnp.asarray(rng.rand(1, 4, 4, 3, 9), jnp.float32)
    tm = to_tap_major(nw)
    assert tm.shape == (1, 4, 4, 27)
    # tap t, channel c lands at t*C + c (C = 3 here)
    np.testing.assert_allclose(np.asarray(tm[0, 2, 3, 3 * 1 + 2]), np.asarray(nw[0, 2, 3, 2, 1]))


def test_diffusion_pallas_gradients():
    import jax

    rng = np.random.RandomState(2)
    k, steps, h, c = 3, 2, 8, 4
    x = jnp.asarray(rng.randn(1, h, h, c), jnp.float32)
    nw = normalize_affinity(jnp.asarray(rng.rand(1, h, h, c, k * k), jnp.float32))

    def loss_pallas(x, w):
        return jnp.sum(diffusion_pallas(x, w, k, steps, True) ** 2)

    def loss_ref(x, w):
        y = x
        for _ in range(steps):
            y = message_passing_step(y, w, k)
        return jnp.sum(y**2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, nw)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, nw)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-5)


def test_diffusion_pallas_v2_matches_and_grads():
    import jax

    from dgtd_tpu.ops.diffusion_pallas import diffusion_pallas_v2

    rng = np.random.RandomState(3)
    k, steps, h, c = 7, 3, 16, 8
    x = jnp.asarray(rng.randn(1, h, h, c), jnp.float32)
    nw = normalize_affinity(jnp.asarray(rng.rand(1, h, h, c, k * k), jnp.float32))
    ref = x
    for _ in range(steps):
        ref = message_passing_step(ref, nw, k)
    out = diffusion_pallas_v2(x, nw, k, steps, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    gx_p = jax.grad(lambda x: jnp.sum(diffusion_pallas_v2(x, nw, k, steps, True) ** 2))(x)
    def ref_loss(x):
        y = x
        for _ in range(steps):
            y = message_passing_step(y, nw, k)
        return jnp.sum(y**2)
    gx_r = jax.grad(ref_loss)(x)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-5)


def test_diffusion_pallas_v2_weight_gradients():
    """Fused per-tap dw kernel vs reference weight gradients."""
    import jax

    from dgtd_tpu.ops.diffusion_pallas import diffusion_pallas_v2

    rng = np.random.RandomState(5)
    k, steps, h, c = 7, 3, 16, 4
    x = jnp.asarray(rng.randn(1, h, h, c), jnp.float32)
    nw = normalize_affinity(jnp.asarray(rng.rand(1, h, h, c, k * k), jnp.float32))

    gw_p = jax.grad(lambda w: jnp.sum(diffusion_pallas_v2(x, w, k, steps, True) ** 2))(nw)

    def ref_loss(w):
        y = x
        for _ in range(steps):
            y = message_passing_step(y, w, k)
        return jnp.sum(y**2)

    gw_r = jax.grad(ref_loss)(nw)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-5)


def test_diffusion_pallas_v2_nonaligned_height():
    """Arbitrary (non-multiple-of-8) H: the v2 kernels pad rows to sublane
    alignment and slice back — review found the old fallback picked strip=h,
    a VMEM blowup at serving widths (and wrong grids when h % strip != 0)."""
    import jax

    from dgtd_tpu.ops.diffusion_pallas import diffusion_pallas_v2

    rng = np.random.RandomState(11)
    k, steps, h, w, c = 7, 2, 12, 20, 3  # h=12, w=20: neither 8-aligned
    x = jnp.asarray(rng.randn(1, h, w, c), jnp.float32)
    nw = normalize_affinity(jnp.asarray(rng.rand(1, h, w, c, k * k), jnp.float32))
    ref = x
    for _ in range(steps):
        ref = message_passing_step(ref, nw, k)
    out = diffusion_pallas_v2(x, nw, k, steps, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda xw: jnp.sum(fn(xw[0], xw[1]) ** 2)

    def ref_fn(xx, ww):
        y = xx
        for _ in range(steps):
            y = message_passing_step(y, ww, k)
        return y

    gp = jax.grad(loss(lambda xx, ww: diffusion_pallas_v2(xx, ww, k, steps, True)))((x, nw))
    gr = jax.grad(loss(ref_fn))((x, nw))
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-5)
