"""Checkpoint converter tests.

(a) layout micro-parity: torch Conv2d/Linear/LayerNorm vs our Flax modules
    with converted weights produce identical outputs;
(b) coverage: a synthetic state dict with the official PVTv2/ConvNeXt key
    schema converts onto every corresponding param in our tree.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dgtd_tpu.models import cod
from dgtd_tpu.tools.convert_ckpt import convert_state_dict
from dgtd_tpu.train.hooks import graft_flat_params


def test_conv_layout_roundtrip():
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = torch.randn(2, 3, 8, 8)
    ref = tconv(x).detach().numpy().transpose(0, 2, 3, 1)

    from dgtd_tpu.models.layers import Conv

    m = Conv(5, 3, padding=1)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    params = jax.tree.map(lambda p: p, params)
    k = np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0))
    b = tconv.bias.detach().numpy()
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}}
    out = np.asarray(m.apply(params, xj))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_depthwise_conv_layout():
    tconv = torch.nn.Conv2d(6, 6, 7, padding=3, groups=6)
    x = torch.randn(1, 6, 12, 12)
    ref = tconv(x).detach().numpy().transpose(0, 2, 3, 1)

    from dgtd_tpu.models.layers import Conv

    m = Conv(6, 7, padding=3, groups=6)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    k = np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0))
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(k), "bias": jnp.asarray(tconv.bias.detach().numpy())}}}
    out = np.asarray(m.apply(params, xj))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def _pvt_b0_torch_keys():
    """Official PVTv2-b0 state-dict schema with shapes (generated from the
    architecture constants at reference cod.py:1762-1769)."""
    dims = [32, 64, 160, 256]
    depths = [2, 2, 2, 2]
    srs = [8, 4, 2, 1]
    ratios = [8, 8, 4, 4]
    keys = {}
    in_ch = 3
    for s in range(4):
        d = dims[s]
        patch = 7 if s == 0 else 3
        keys[f"patch_embed{s + 1}.proj.weight"] = (d, in_ch, patch, patch)
        keys[f"patch_embed{s + 1}.proj.bias"] = (d,)
        keys[f"patch_embed{s + 1}.norm.weight"] = (d,)
        keys[f"patch_embed{s + 1}.norm.bias"] = (d,)
        for i in range(depths[s]):
            p = f"block{s + 1}.{i}."
            keys[p + "norm1.weight"] = (d,)
            keys[p + "norm1.bias"] = (d,)
            keys[p + "attn.q.weight"] = (d, d)
            keys[p + "attn.q.bias"] = (d,)
            keys[p + "attn.kv.weight"] = (2 * d, d)
            keys[p + "attn.kv.bias"] = (2 * d,)
            keys[p + "attn.proj.weight"] = (d, d)
            keys[p + "attn.proj.bias"] = (d,)
            if srs[s] > 1:
                keys[p + "attn.sr.weight"] = (d, d, srs[s], srs[s])
                keys[p + "attn.sr.bias"] = (d,)
                keys[p + "attn.norm.weight"] = (d,)
                keys[p + "attn.norm.bias"] = (d,)
            keys[p + "norm2.weight"] = (d,)
            keys[p + "norm2.bias"] = (d,)
            h = d * ratios[s]
            keys[p + "mlp.fc1.weight"] = (h, d)
            keys[p + "mlp.fc1.bias"] = (h,)
            keys[p + "mlp.dwconv.dwconv.weight"] = (h, 1, 3, 3)
            keys[p + "mlp.dwconv.dwconv.bias"] = (h,)
            keys[p + "mlp.fc2.weight"] = (d, h)
            keys[p + "mlp.fc2.bias"] = (d,)
        keys[f"norm{s + 1}.weight"] = (d,)
        keys[f"norm{s + 1}.bias"] = (d,)
        in_ch = d
    keys["head.weight"] = (1000, dims[-1])  # ignored by converter
    keys["head.bias"] = (1000,)
    return keys


@pytest.mark.slow
def test_pvt_conversion_covers_backbone():
    rng = np.random.RandomState(0)
    state = {k: rng.randn(*shape).astype(np.float32) for k, shape in _pvt_b0_torch_keys().items()}
    flat, skipped = convert_state_dict(state, "pvt")
    assert set(skipped) == {"head.weight", "head.bias"}

    model = cod(dtype=jnp.float32, variant="b0", convnext_dims=(16, 32), convnext_depths=(1, 1))
    # only need the param structure: init tiny
    variables = model.init(jax.random.PRNGKey(0), (1, 48, 48, 3))
    params = jax.device_get(variables["params"])

    backbone = params["hitnet"]["backbone"]
    new_bb, loaded, missed = graft_flat_params(backbone, flat)
    assert not missed, f"backbone params not covered: {missed[:10]}"
    assert len(loaded) == len(flat)
    # converted values actually landed
    got = np.asarray(new_bb["patch_embed1"]["Conv_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        got, np.transpose(state["patch_embed1.proj.weight"], (2, 3, 1, 0))
    )


def _convnext_torch_keys(dims=(16, 32), depths=(1, 1)):
    keys = {}
    keys["downsample_layers.0.0.weight"] = (dims[0], 3, 4, 4)
    keys["downsample_layers.0.0.bias"] = (dims[0],)
    keys["downsample_layers.0.1.weight"] = (dims[0],)
    keys["downsample_layers.0.1.bias"] = (dims[0],)
    for i in range(1, len(dims)):
        keys[f"downsample_layers.{i}.0.weight"] = (dims[i - 1],)
        keys[f"downsample_layers.{i}.0.bias"] = (dims[i - 1],)
        keys[f"downsample_layers.{i}.1.weight"] = (dims[i], dims[i - 1], 2, 2)
        keys[f"downsample_layers.{i}.1.bias"] = (dims[i],)
    for i, (d, n) in enumerate(zip(dims, depths)):
        for j in range(n):
            p = f"stages.{i}.{j}."
            keys[p + "dwconv.weight"] = (d, 1, 7, 7)
            keys[p + "dwconv.bias"] = (d,)
            keys[p + "norm.weight"] = (d,)
            keys[p + "norm.bias"] = (d,)
            keys[p + "pwconv1.weight"] = (4 * d, d)
            keys[p + "pwconv1.bias"] = (4 * d,)
            keys[p + "pwconv2.weight"] = (d, 4 * d)
            keys[p + "pwconv2.bias"] = (d,)
            keys[p + "gamma"] = (d,)
    keys["norm.weight"] = (dims[-1],)  # final LN — not part of our encoder
    keys["norm.bias"] = (dims[-1],)
    return keys


@pytest.mark.slow
def test_convnext_conversion_covers_tower():
    rng = np.random.RandomState(1)
    state = {k: rng.randn(*s).astype(np.float32) for k, s in _convnext_torch_keys().items()}
    flat, skipped = convert_state_dict(state, "convnext")
    assert set(skipped) == {"norm.weight", "norm.bias"}

    model = cod(dtype=jnp.float32, variant="b0", convnext_dims=(16, 32), convnext_depths=(1, 1))
    variables = model.init(jax.random.PRNGKey(0), (1, 48, 48, 3))
    tower = jax.device_get(variables["params"])["hitnet"]["prompt_encoder"]["encoder2"]
    new_tower, loaded, missed = graft_flat_params(tower, flat)
    # FPN head (lateral/fusion) has no official-ckpt source — everything else covers
    assert all(m.startswith(("lateral", "fusion")) for m in missed), missed
    assert len(loaded) == len(flat)


def test_inverse_transforms_roundtrip():
    """export's inverse transposes undo the forward layout transforms."""
    from dgtd_tpu.tools.convert_ckpt import _INVERSE_TF, _conv_w, _ident, _lin_w

    rng = np.random.RandomState(3)
    conv = rng.randn(8, 4, 3, 3).astype(np.float32)  # torch OIHW
    lin = rng.randn(6, 5).astype(np.float32)
    vec = rng.randn(7).astype(np.float32)
    np.testing.assert_array_equal(_INVERSE_TF[_conv_w](_conv_w(conv)), conv)
    np.testing.assert_array_equal(_INVERSE_TF[_lin_w](_lin_w(lin)), lin)
    np.testing.assert_array_equal(_INVERSE_TF[_ident](_ident(vec)), vec)


@pytest.mark.slow
def test_export_roundtrips_reference_state_dict():
    """convert full -> export reproduces the ACTUAL reference cod state_dict
    bit-exactly on every mapped key (trained dgtd_tpu weights can run on the
    reference torch stack), and the exported dict load_state_dicts cleanly."""
    import torch

    from dgtd_tpu.tools.convert_ckpt import export_state_dict
    from dgtd_tpu.tools.ref_oracle import load_reference_cod

    model = load_reference_cod().cod()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    flat, skipped = convert_state_dict(sd, "full")
    # zero the template's float tensors: every exported value must come from
    # OUR flat tree, not leak through from the template
    template = {
        k: (np.zeros_like(v) if v.dtype.kind == "f" else v) for k, v in sd.items()
    }
    out, left, missing = export_state_dict(flat, template)
    assert missing == []
    matched = sorted(set(sd) - set(left))
    assert len(matched) > 700, f"only {len(matched)} keys round-trip"
    for k in matched:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)
    # keys left at template values are exactly the forward conversion's
    # skipped set (the reference's dead modules + counters)
    assert set(left) == set(skipped)
    tensors = {k: torch.as_tensor(np.array(v)) for k, v in out.items()}
    assert all(tensors[k].shape == v.shape for k, v in model.state_dict().items())
    missing, unexpected = model.load_state_dict(tensors)
    assert not missing and not unexpected


def test_export_rejects_partial_source():
    """A mapped template key with no source in our tree must raise (silently
    exporting template values would ship init weights in a cleanly-loading
    .pth) unless allow_missing."""
    from dgtd_tpu.tools.convert_ckpt import export_state_dict

    template = {
        "hitnet.out_CFM.weight": np.zeros((1, 32, 1, 1), np.float32),
        "hitnet.out_CFM.bias": np.zeros((1,), np.float32),
    }
    flat = {"params/hitnet/out_CFM/Conv_0/kernel": np.ones((1, 1, 32, 1), np.float32)}
    with pytest.raises(ValueError, match="no source in the checkpoint"):
        export_state_dict(flat, template)
    out, left, missing = export_state_dict(flat, template, allow_missing=True)
    assert left == ["hitnet.out_CFM.bias"] and missing == ["hitnet.out_CFM.bias"]
    assert out["hitnet.out_CFM.weight"].shape == (1, 32, 1, 1)
