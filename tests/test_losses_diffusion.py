"""Golden numeric tests for losses and the message-passing diffusion step.

torch (CPU) implements the reference formulas directly as an independent
oracle (SURVEY.md §4(b): golden tests for FFT high-pass, MessagePassing,
SSIM, cal_loss against small fixed tensors).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dgtd_tpu.models.losses import ssim_loss, structure_loss
from dgtd_tpu.models.diffusion import message_passing_step, normalize_affinity


def torch_structure_loss(pred, mask):
    weit = 1 + 5 * torch.abs(F.avg_pool2d(mask, 31, 1, 15) - mask)
    wbce = F.binary_cross_entropy_with_logits(pred, mask, reduction="none")
    wbce = (weit * wbce).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    pred = torch.sigmoid(pred)
    inter = ((pred * mask) * weit).sum(dim=(2, 3))
    union = ((pred + mask) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    return (wbce + wiou).mean()


def test_structure_loss_matches_reference_formula():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 64, 64, 1).astype(np.float32)
    gts = (rng.rand(2, 64, 64, 1) > 0.5).astype(np.float32)
    ours = float(structure_loss(jnp.asarray(logits), jnp.asarray(gts)))
    ref = float(
        torch_structure_loss(
            torch.from_numpy(logits.transpose(0, 3, 1, 2).copy()),
            torch.from_numpy(gts.transpose(0, 3, 1, 2).copy()),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def torch_ssim(x, y):
    refl = torch.nn.ReflectionPad2d(1)
    x, y = refl(x), refl(y)
    pool = lambda t: F.avg_pool2d(t, 3, 1)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x**2) - mu_x**2
    sigma_y = pool(y**2) - mu_y**2
    sigma_xy = pool(x * y) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return torch.clamp((1 - n / d) / 2, 0, 1).mean(1, True).mean()


def test_ssim_matches_reference_formula():
    rng = np.random.RandomState(1)
    a = rng.rand(2, 32, 32, 3).astype(np.float32)
    b = rng.rand(2, 32, 32, 3).astype(np.float32)
    ours = float(ssim_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(
        torch_ssim(
            torch.from_numpy(a.transpose(0, 3, 1, 2).copy()),
            torch.from_numpy(b.transpose(0, 3, 1, 2).copy()),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def torch_message_passing(x, weight, k, steps):
    """Reference MessagePassing inner loop (cod.py:1189-1205), NCHW."""
    eps = 1e-5
    n, c, h, w = x.shape
    size = k * k
    wc = weight.shape[1] // size
    weight = weight.view(n, wc, size, h * w)
    norm_weight = weight / (torch.sum(weight, dim=2).unsqueeze(2) + eps)
    for _ in range(steps):
        x = F.unfold(x, kernel_size=k, padding=k // 2).view(n, c, size, h * w)
        x = (x * norm_weight).sum(2).view(n, c, h, w)
    return x


def test_message_passing_matches_reference():
    rng = np.random.RandomState(2)
    k, steps, latent, g = 7, 4, 24, 12
    x = rng.randn(2, g, g, latent).astype(np.float32)
    w = rng.rand(2, g, g, latent * k * k).astype(np.float32)

    wt = normalize_affinity(jnp.asarray(w).reshape(2, g, g, latent, k * k))
    out = jnp.asarray(x)
    for _ in range(steps):
        out = message_passing_step(out, wt, k)
    ours = np.asarray(out)

    # torch reference expects weight channels as latent*size (channel-major)
    tw = torch.from_numpy(w.transpose(0, 3, 1, 2).copy())
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    ref = torch_message_passing(tx, tw, k, steps).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_message_passing_k3():
    rng = np.random.RandomState(3)
    k, steps, latent, g = 3, 6, 8, 12
    x = rng.randn(1, g, g, latent).astype(np.float32)
    w = rng.rand(1, g, g, latent * k * k).astype(np.float32)
    wt = normalize_affinity(jnp.asarray(w).reshape(1, g, g, latent, k * k))
    out = jnp.asarray(x)
    for _ in range(steps):
        out = message_passing_step(out, wt, k)
    tw = torch.from_numpy(w.transpose(0, 3, 1, 2).copy())
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    ref = torch_message_passing(tx, tw, k, steps).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_plane_layout_path_matches_nhwc_path():
    """The serving plane-layout diffusion stack (PlaneConv1x1 regressors +
    diffusion_pallas_v2_planes, interpret mode) computes the same function as
    the NHWC path with the SAME param tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgtd_tpu.core import flags
    from dgtd_tpu.models.diffusion import PromptEncoder

    kwargs = dict(
        latent_dim=6,
        grid=16,
        kernel=3,
        steps=2,
        convnext_dims=(8, 16, 32, 64),
        convnext_depths=(1, 1, 1, 1),
        pallas_interpret=True,
        dtype=jnp.float32,
    )
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)

    flags.set_flag("diffusion_plane_layout", False)
    try:
        enc = PromptEncoder(**kwargs)
        variables = enc.init(jax.random.PRNGKey(0), image, depth)
        tex_a, emb_a = enc.apply(variables, image, depth)
        flags.set_flag("diffusion_plane_layout", True)
        # same module, same variables — only the layout/kernel path differs
        tex_b, emb_b = enc.apply(variables, image, depth)
        # and the plane path can also init from scratch with an identical tree
        v2 = PromptEncoder(**kwargs).init(jax.random.PRNGKey(0), image, depth)
        assert jax.tree.structure(v2) == jax.tree.structure(variables)
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(v2),
            jax.tree_util.tree_leaves_with_path(variables),
        ):
            assert p1 == p2 and a.shape == b.shape
    finally:
        flags.set_flag("diffusion_plane_layout", None)
    np.testing.assert_allclose(np.asarray(tex_b), np.asarray(tex_a), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb_b), np.asarray(emb_a), rtol=1e-4, atol=1e-5)
