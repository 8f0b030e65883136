"""Fused Pallas LayerNorm vs flax/torch semantics (interpret mode)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dgtd_tpu.ops.layernorm_pallas import layer_norm_pallas


def test_matches_torch_layernorm():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7, 130).astype(np.float32)  # C not 128-aligned
    scale = rng.randn(130).astype(np.float32)
    bias = rng.randn(130).astype(np.float32)
    ours = np.asarray(
        layer_norm_pallas(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 1e-6, True)
    )
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (130,), torch.from_numpy(scale), torch.from_numpy(bias), 1e-6
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bf16_io_fp32_stats():
    rng = np.random.RandomState(1)
    x = (rng.randn(512, 64) * 3 + 100).astype(np.float32)  # large mean stresses stats
    xb = jnp.asarray(x, jnp.bfloat16)
    s = jnp.ones(64)
    b = jnp.zeros(64)
    out = layer_norm_pallas(xb, s, b, 1e-5, True)
    assert out.dtype == jnp.bfloat16
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(np.asarray(xb, np.float32)), (64,), eps=1e-5
    ).numpy()
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=0.05, atol=0.05)


def test_gradients_match_reference():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(64, 32), jnp.float32)
    s = jnp.asarray(rng.randn(32), jnp.float32)
    b = jnp.asarray(rng.randn(32), jnp.float32)

    gx, gs, gb = jax.grad(
        lambda x, s, b: jnp.sum(layer_norm_pallas(x, s, b, 1e-6, True) ** 2), argnums=(0, 1, 2)
    )(x, s, b)

    tx = torch.from_numpy(np.asarray(x)).requires_grad_(True)
    ts = torch.from_numpy(np.asarray(s)).requires_grad_(True)
    tb = torch.from_numpy(np.asarray(b)).requires_grad_(True)
    (torch.nn.functional.layer_norm(tx, (32,), ts, tb, 1e-6) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), ts.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), rtol=1e-3, atol=1e-4)
