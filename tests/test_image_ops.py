"""Parity tests for dgtd_tpu.utils.image against torch op semantics.

torch (CPU) is the oracle for interpolate/pool/unfold/fft behavior, mirroring
the reference's kernel-vs-pytorch-reference test pattern
(/root/reference/twig/ops/test.py).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dgtd_tpu.utils import image as I


def to_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def from_torch(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_size,out_size", [(12, 384), (48, 384), (96, 24), (13, 7), (7, 13)])
@pytest.mark.parametrize("align", [False, True])
def test_resize_bilinear_matches_torch(in_size, out_size, align):
    rng = np.random.RandomState(0)
    x = rng.randn(2, in_size, in_size, 3).astype(np.float32)
    ours = np.asarray(I.resize_bilinear(jnp.asarray(x), (out_size, out_size), align))
    ref = from_torch(
        F.interpolate(to_nchw(x), size=(out_size, out_size), mode="bilinear", align_corners=align)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=3e-5)


def test_resize_scale_floor():
    x = np.random.RandomState(1).randn(1, 11, 11, 2).astype(np.float32)
    ours = np.asarray(I.resize_scale(jnp.asarray(x), 0.5, align_corners=True))
    ref = from_torch(
        F.interpolate(to_nchw(x), scale_factor=0.5, mode="bilinear", align_corners=True)
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel,stride,pad", [(31, 1, 15), (3, 1, 0), (3, 2, 1)])
def test_avg_pool_matches_torch(kernel, stride, pad):
    x = np.random.RandomState(2).randn(2, 33, 33, 4).astype(np.float32)
    ours = np.asarray(I.avg_pool(jnp.asarray(x), kernel, stride, pad))
    ref = from_torch(F.avg_pool2d(to_nchw(x), kernel, stride, pad))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_extract_patches_matches_unfold():
    x = np.random.RandomState(3).randn(2, 12, 12, 5).astype(np.float32)
    k, pad = 7, 3
    ours = np.asarray(I.extract_patches(jnp.asarray(x), k, pad))  # (B,H,W,C,49)
    ref = F.unfold(to_nchw(x), kernel_size=k, padding=pad)  # (B, C*49, L)
    b, h, w, c = x.shape
    ref = ref.numpy().reshape(b, c, k * k, h, w).transpose(0, 3, 4, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("size,rate", [(384, 0.3), (12, 0.5), (64, 0.25)])
def test_fft_high_pass_matches_torch(size, rate):
    x = np.random.RandomState(4).rand(1, size, size, 3).astype(np.float32)
    ours = np.asarray(I.fft_high_pass(jnp.asarray(x), rate))

    t = to_nchw(x)
    mask = torch.zeros(t.shape)
    w, h = t.shape[-2:]
    line = int((w * h * rate) ** 0.5 // 2)
    mask[:, :, w // 2 - line : w // 2 + line, h // 2 - line : h // 2 + line] = 1
    spec = torch.fft.fftshift(torch.fft.fft2(t, norm="forward"))
    spec = spec * (1 - mask)
    inv = torch.fft.ifft2(torch.fft.ifftshift(spec), norm="forward").real
    ref = from_torch(torch.abs(inv))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_reflect_pad():
    x = np.random.RandomState(5).randn(1, 6, 6, 2).astype(np.float32)
    ours = np.asarray(I.reflect_pad(jnp.asarray(x), 1))
    ref = from_torch(F.pad(to_nchw(x), (1, 1, 1, 1), mode="reflect"))
    np.testing.assert_allclose(ours, ref)


def test_max_pool():
    x = np.random.RandomState(6).randn(2, 8, 8, 3).astype(np.float32)
    ours = np.asarray(I.max_pool(jnp.asarray(x), 2, 2))
    ref = from_torch(F.max_pool2d(to_nchw(x), 2, 2))
    np.testing.assert_allclose(ours, ref)


def test_surface_normals_matches_torch_gradient():
    depth = np.random.RandomState(7).rand(2, 16, 16, 1).astype(np.float32)
    ours = np.asarray(I.compute_surface_normals(jnp.asarray(depth)))
    t = torch.from_numpy(depth.transpose(0, 3, 1, 2).copy())
    dzdx = torch.gradient(t, dim=2)[0]
    dzdy = torch.gradient(t, dim=3)[0]
    nx, ny, nz = -dzdx, -dzdy, torch.ones_like(t)
    norm = torch.sqrt(nx**2 + ny**2 + nz**2)
    ref = torch.cat([nx / norm, ny / norm, nz / norm], dim=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# SAM-style debug helpers (utils/vis_debug.py vs reference cod.py:48-116)
# ---------------------------------------------------------------------------


def test_activation_filter_matches_torch_formula():
    from dgtd_tpu.utils.vis_debug import activation_filter

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 8, 9).astype(np.float32)
    t = torch.from_numpy(x)
    thresh, _ = torch.max(t.view(2, 3, 72), dim=2)
    ref = (0.25 * thresh).view(2, 3, 1, 1).numpy()
    np.testing.assert_allclose(activation_filter(x, 0.25), ref)


def _cv2_find_bbox(feat_map: np.ndarray, binary_thresh: float) -> np.ndarray:
    """The exact reference pipeline (cod.py:59-69), cv2 as oracle."""
    import cv2

    fm = feat_map.copy()
    fm[fm < binary_thresh] = 0
    fm = (fm * 255).astype("uint8")
    contours, _ = cv2.findContours(fm, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)[-2:]
    areas = [cv2.contourArea(c) for c in contours]
    x, y, w, h = cv2.boundingRect(contours[areas.index(max(areas))])
    return np.array([x, y, x + w, y + h])


def test_find_bbox_matches_cv2_reference():
    from dgtd_tpu.utils.vis_debug import find_bbox

    cv2 = pytest.importorskip("cv2")  # oracle only; framework needs no cv2
    rng = np.random.RandomState(1)
    for trial in range(8):
        fm = np.zeros((32, 40), np.float32)
        # two solid random blobs of different sizes
        for size in (rng.randint(3, 8), rng.randint(8, 14)):
            y0 = rng.randint(0, 32 - size)
            x0 = rng.randint(0, 40 - size)
            fm[y0 : y0 + size, x0 : x0 + size] = rng.uniform(0.6, 1.0)
        ref = _cv2_find_bbox(fm, 0.5)
        np.testing.assert_array_equal(find_bbox(fm, 0.5), ref)


def test_find_bbox_raises_on_empty():
    from dgtd_tpu.utils.vis_debug import find_bbox

    with pytest.raises(ValueError):
        find_bbox(np.zeros((8, 8), np.float32), 0.5)


def test_show_helpers_draw():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dgtd_tpu.utils.vis_debug import show_box, show_mask

    fig, ax = plt.subplots()
    show_mask(np.ones((4, 4), np.float32), ax)
    show_box(np.array([0, 0, 2, 2]), ax)
    assert len(ax.patches) == 1 and len(ax.images) == 1
    plt.close(fig)


def test_find_bbox_thin_blob_delta_pinned():
    """Documented delta (utils/vis_debug.py docstring): cv2 contourArea of a
    1-pixel-wide line is 0 while our pixel count is positive, so against a
    smaller solid square OUR helper picks the line and cv2 picks the square.
    Pin our semantics so the divergence stays deliberate."""
    from dgtd_tpu.utils.vis_debug import find_bbox

    fm = np.zeros((16, 24), np.float32)
    fm[2, 3:15] = 1.0  # 12-pixel line (cv2 contourArea 0)
    fm[8:11, 4:7] = 1.0  # 3x3 square (9 pixels, cv2 contourArea 4)
    np.testing.assert_array_equal(find_bbox(fm, 0.5), [3, 2, 15, 3])  # the line
    cv2 = pytest.importorskip("cv2")
    np.testing.assert_array_equal(_cv2_find_bbox(fm, 0.5), [4, 8, 7, 11])  # the square
