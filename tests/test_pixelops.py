"""Native pixel pipeline vs the jnp half-pixel bilinear reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from dgtd_tpu.native import pixelops
from dgtd_tpu.utils.image import resize_bilinear

pytestmark = pytest.mark.skipif(not pixelops.available(), reason="no native toolchain")


def test_resize_matches_jnp_reference():
    rng = np.random.RandomState(0)
    src = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    out = pixelops.resize_normalize(src, (64, 48))
    ref = np.asarray(resize_bilinear(jnp.asarray(src[None], jnp.float32) / 255.0, (64, 48)))[0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_normalize_and_flip():
    rng = np.random.RandomState(1)
    src = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = pixelops.resize_normalize(src, (16, 16), mean, std, flip=True)
    ref = (src[:, ::-1].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_grayscale_plane():
    rng = np.random.RandomState(2)
    src = (rng.rand(20, 20) * 255).astype(np.uint8)
    out = pixelops.resize_normalize(src, (10, 10))
    ref = np.asarray(
        resize_bilinear(jnp.asarray(src[None, :, :, None], jnp.float32) / 255.0, (10, 10))
    )[0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_resize_u8_matches_float_path():
    """uint8-out resize (device-normalize shipping path) == the float resize
    requantized round-to-nearest, for both color and grayscale."""
    rng = np.random.RandomState(3)
    for shape, out_hw in (((37, 53, 3), (64, 48)), ((20, 20), (10, 10))):
        src = (rng.rand(*shape) * 255).astype(np.uint8)
        got = pixelops.resize_u8(src, out_hw)
        ref = pixelops.resize_normalize(src, out_hw) * 255.0  # mean 0 / std 1
        ref_u8 = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got, ref_u8)


def test_resize_u8_flip():
    rng = np.random.RandomState(4)
    src = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    got = pixelops.resize_u8(src, (16, 16), flip=True)
    np.testing.assert_array_equal(got, src[:, ::-1])
