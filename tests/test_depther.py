"""Offline-depther parity tests (DINOv2 ViT + DPT head, models/dinov2.py,
models/dpt.py).

The reference assembles its depther from the public DINOv2 release
(/root/reference/dino.py:74-140). These tests build a tiny torch MIRROR of
that stack whose ``state_dict()`` uses the official key schema
(``blocks.N.attn.qkv.weight``, ``decode_head.fusion_blocks.N...``), convert
it with ``convert_ckpt`` kinds ``dinov2``/``dpt_head``, graft, and assert the
JAX forward matches the torch forward — so both the architecture semantics
and the converter's key mapping are pinned by one oracle.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dgtd_tpu.models.dinov2 import DinoViT, interpolate_pos_embed, torch_bicubic_matrix
from dgtd_tpu.models.dpt import DinoDPTDepther, DPTHead, center_pad
from dgtd_tpu.tools.convert_ckpt import convert_state_dict
from dgtd_tpu.train.hooks import graft_flat_params

torch.manual_seed(0)

# ---------------------------------------------------------------------------
# torch mirror of the official DINOv2 backbone (facebookresearch/dinov2
# vision_transformer.py schema)
# ---------------------------------------------------------------------------

DIM, HEADS, DEPTH, PATCH, PRE_GRID = 32, 2, 4, 14, 3


class _TAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(b, n, c))


class _TLayerScale(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = tnn.Parameter(torch.randn(dim) * 0.1 + 1.0)

    def forward(self, x):
        return x * self.gamma


class _TMlp(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _TBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _TAttention(dim, heads)
        self.ls1 = _TLayerScale(dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TMlp(dim)
        self.ls2 = _TLayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class _TPatchEmbed(tnn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, patch, patch)


class _TDinoViT(tnn.Module):
    """dinov2 DinoVisionTransformer (block_chunks=0) mirror."""

    def __init__(self, dim=DIM, heads=HEADS, depth=DEPTH, patch=PATCH, grid=PRE_GRID):
        super().__init__()
        self.patch = patch
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, grid * grid + 1, dim) * 0.02)
        self.mask_token = tnn.Parameter(torch.zeros(1, dim))  # converter must skip
        self.patch_embed = _TPatchEmbed(dim, patch)
        self.blocks = tnn.ModuleList([_TBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def interpolate_pos_encoding(self, npatch_hw):
        # dinov2 vision_transformer.py:interpolate_pos_encoding with
        # interpolate_offset=0.1, antialias=False
        h0, w0 = npatch_hw
        n = self.pos_embed.shape[1] - 1
        m = int(math.sqrt(n))
        if (h0, w0) == (m, m):
            return self.pos_embed
        cls_pos = self.pos_embed[:, :1]
        grid = self.pos_embed[:, 1:].reshape(1, m, m, -1).permute(0, 3, 1, 2)
        grid = F.interpolate(
            grid,
            scale_factor=((h0 + 0.1) / m, (w0 + 0.1) / m),
            mode="bicubic",
            antialias=False,
        )
        assert grid.shape[-2:] == (h0, w0)
        grid = grid.permute(0, 2, 3, 1).reshape(1, h0 * w0, -1)
        return torch.cat([cls_pos, grid], dim=1)

    def get_intermediate_layers(self, x, n, final_norm=False):
        b, _, h, w = x.shape
        tok = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        tok = torch.cat([self.cls_token.expand(b, -1, -1), tok], dim=1)
        tok = tok + self.interpolate_pos_encoding((h // self.patch, w // self.patch))
        outs = []
        for i, blk in enumerate(self.blocks):
            tok = blk(tok)
            if i in n:
                outs.append(tok)
        results = []
        for o in outs:
            if final_norm:
                o = self.norm(o)
            feat = o[:, 1:].reshape(b, h // self.patch, w // self.patch, -1).permute(0, 3, 1, 2)
            results.append((feat, o[:, 0]))
        return results


# ---------------------------------------------------------------------------
# torch mirror of the official DPT head (mmseg/dinov2-release dpt_head.py)
# ---------------------------------------------------------------------------

PPC, CH, NBINS = (8, 16, 24, 32), 16, 8


class _TCM(tnn.Module):
    """ConvModule(conv-only) mirror -> keys '<name>.conv.weight'."""

    def __init__(self, cin, cout, k, s=1, p=0, bias=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, p, bias=bias)

    def forward(self, x):
        return self.conv(x)


class _TPreActRCU(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = _TCM(ch, ch, 3, 1, 1)
        self.conv2 = _TCM(ch, ch, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(F.relu(x))))


class _TFusion(tnn.Module):
    def __init__(self, ch, first=False):
        super().__init__()
        self.project = _TCM(ch, ch, 1)
        if not first:
            self.res_conv_unit1 = _TPreActRCU(ch)
        self.res_conv_unit2 = _TPreActRCU(ch)

    def forward(self, x, skip=None):
        if skip is not None:
            if skip.shape[2:] != x.shape[2:]:
                skip = F.interpolate(skip, size=x.shape[2:], mode="bilinear", align_corners=False)
            x = x + self.res_conv_unit1(skip)
        x = self.res_conv_unit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.project(x)


class _TReassemble(tnn.Module):
    def __init__(self, dim=DIM, ppc=PPC):
        super().__init__()
        self.readout_projects = tnn.ModuleList(
            [tnn.Sequential(tnn.Linear(2 * dim, dim), tnn.GELU()) for _ in ppc]
        )
        self.projects = tnn.ModuleList([_TCM(dim, c, 1) for c in ppc])
        self.resize_layers = tnn.ModuleList(
            [
                tnn.ConvTranspose2d(ppc[0], ppc[0], 4, 4),
                tnn.ConvTranspose2d(ppc[1], ppc[1], 2, 2),
                tnn.Identity(),
                tnn.Conv2d(ppc[3], ppc[3], 3, 2, 1),
            ]
        )

    def forward(self, inputs):
        outs = []
        for i, (x, cls) in enumerate(inputs):
            b, c, h, w = x.shape
            flat = x.flatten(2).permute(0, 2, 1)
            readout = cls.unsqueeze(1).expand_as(flat)
            flat = self.readout_projects[i](torch.cat([flat, readout], dim=-1))
            x = flat.permute(0, 2, 1).reshape(b, c, h, w)
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            outs.append(x)
        return outs


class _TDPTHead(tnn.Module):
    def __init__(self, dim=DIM, ppc=PPC, ch=CH, n_bins=NBINS, classify=True):
        super().__init__()
        self.reassemble_blocks = _TReassemble(dim, ppc)
        self.convs = tnn.ModuleList([_TCM(c, ch, 3, 1, 1, bias=False) for c in ppc])
        self.fusion_blocks = tnn.ModuleList(
            [_TFusion(ch, first=(i == 0)) for i in range(4)]
        )
        self.project = _TCM(ch, ch, 3, 1, 1)
        self.classify = classify
        self.conv_depth = tnn.Conv2d(ch, n_bins if classify else 1, 3, padding=1)
        self.min_depth, self.max_depth = 0.001, 10.0

    def forward(self, inputs):
        x = self.reassemble_blocks(inputs)
        x = [self.convs[i](xi) for i, xi in enumerate(x)]
        out = self.fusion_blocks[0](x[-1])
        for i in range(1, 4):
            out = self.fusion_blocks[i](out, x[-(i + 1)])
        out = F.relu(self.project(out))
        logit = self.conv_depth(out)
        if not self.classify:
            return F.relu(logit) + self.min_depth
        bins = torch.linspace(self.min_depth, self.max_depth, logit.shape[1])
        p = F.relu(logit) + 0.1
        p = p / p.sum(dim=1, keepdim=True)
        return torch.einsum("bkhw,k->bhw", p, bins).unsqueeze(1)


class _TDepther(tnn.Module):
    """create_depther mirror (dino.py:74-90): CenterPadding -> intermediate
    layers (final_norm=False) -> head -> resize to input size."""

    def __init__(self):
        super().__init__()
        self.backbone = _TDinoViT()
        self.decode_head = _TDPTHead()

    def forward(self, x, out_indices=(0, 1, 2, 3)):
        h, w = x.shape[2:]
        mult = self.backbone.patch
        ph = math.ceil(h / mult) * mult - h
        pw = math.ceil(w / mult) * mult - w
        xp = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        feats = self.backbone.get_intermediate_layers(xp, out_indices, final_norm=False)
        pred = self.decode_head(feats)
        return F.interpolate(pred, size=(h, w), mode="bilinear", align_corners=False)


# ---------------------------------------------------------------------------


def test_bicubic_matrix_matches_torch_interpolate():
    rng = np.random.RandomState(0)
    grid = rng.randn(1, 5, PRE_GRID, PRE_GRID).astype(np.float32)
    for h0, w0 in [(4, 5), (7, 3), (2, 2)]:
        sx, sy = (h0 + 0.1) / PRE_GRID, (w0 + 0.1) / PRE_GRID
        ref = F.interpolate(
            torch.from_numpy(grid), scale_factor=(sx, sy), mode="bicubic", antialias=False
        ).numpy()
        wh = torch_bicubic_matrix(PRE_GRID, h0, scale=sx)
        ww = torch_bicubic_matrix(PRE_GRID, w0, scale=sy)
        ours = np.einsum("om,bcmn->bcon", wh, grid)
        ours = np.einsum("pn,bcon->bcop", ww, ours)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_interpolate_pos_embed_identity_at_native_grid():
    pe = jnp.asarray(np.random.RandomState(1).randn(1, PRE_GRID**2 + 1, 8).astype(np.float32))
    out = interpolate_pos_embed(pe, (PRE_GRID, PRE_GRID))
    assert out is pe


def test_center_pad_matches_torch():
    x = np.random.RandomState(2).randn(1, 5, 9, 3).astype(np.float32)
    ours = np.asarray(center_pad(jnp.asarray(x), 4))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ph, pw = 8 - 5, 12 - 9
    ref = F.pad(t, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref)


def test_depther_forward_matches_torch_mirror():
    """End-to-end: tiny DINOv2+DPT, official key schema -> convert -> graft ->
    non-native resolution (pos-embed interpolation + center padding + the
    odd-grid fusion resize guard all exercised) matches torch."""
    tm = _TDepther().eval()
    x = np.random.RandomState(3).randn(2, 40, 50, 3).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    jm = DinoDPTDepther(
        arch="tiny",
        out_indices=(0, 1, 2, 3),
        n_bins=NBINS,
        channels=CH,
        post_process_channels=PPC,
        pretrain_grid=PRE_GRID,
    )
    # register the tiny arch for the test
    from dgtd_tpu.models import dinov2 as d2

    d2.DINOV2_ARCHS["tiny"] = (DIM, DEPTH, HEADS, "mlp")
    try:
        variables = _to_jax_params_depther(tm, jm, x.shape)
        out = np.asarray(jax.jit(jm.apply)(variables, jnp.asarray(x)))
    finally:
        d2.DINOV2_ARCHS.pop("tiny")
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def _to_jax_params_depther(tm, jm, xshape):
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    backbone = {
        k[len("backbone.") :]: v for k, v in state.items() if k.startswith("backbone.")
    }
    flat_b, skipped_b = convert_state_dict(backbone, "dinov2")
    flat_h, skipped_h = convert_state_dict(state, "dpt_head")  # decode_head.* prefix kept
    assert skipped_b == ["mask_token"], skipped_b
    # backbone.* keys fall through dpt_head mapping by design
    assert all(k.startswith("backbone.") for k in skipped_h), skipped_h
    flat = {f"backbone/{k}": v for k, v in flat_b.items()}
    flat.update({f"decode_head/{k}": v for k, v in flat_h.items()})
    var = jax.eval_shape(lambda: jm.init(jax.random.PRNGKey(0), jnp.zeros(xshape)))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), var)["params"]
    params, loaded, missed = graft_flat_params(params, flat)
    assert missed == [], missed
    return {"params": params}


def test_dpt_regression_head_path():
    """classify=False keeps the plain relu+min_depth regression contract."""
    head = DPTHead(channels=CH, post_process_channels=PPC, classify=False)
    feats = [
        (jnp.ones((1, 4, 4, DIM)) * 0.1, jnp.ones((1, DIM)) * 0.1) for _ in range(4)
    ]
    var = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(var, feats)
    assert out.shape == (1, 32, 32, 1)
    assert np.all(np.asarray(out) >= 0.001)


class _TSwiGLUFFN(tnn.Module):
    """dinov2 SwiGLUFFNFused mirror (official keys mlp.w12 / mlp.w3)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.w12 = tnn.Linear(dim, 2 * hidden)
        self.w3 = tnn.Linear(hidden, dim)

    def forward(self, x):
        x12 = self.w12(x)
        x1, x2 = x12.chunk(2, dim=-1)
        return self.w3(F.silu(x1) * x2)


def test_swiglu_block_matches_torch_mirror():
    """ViT-g/14's fused-SwiGLU FFN: converter keys (mlp.w12/w3) + forward
    parity, incl. the SwiGLU-aligned hidden width (int(d*4*2/3)+7)//8*8."""
    from dgtd_tpu.models.dinov2 import DinoBlock

    dim, heads = 24, 2
    hidden = (int(dim * 4.0 * 2 / 3) + 7) // 8 * 8

    tb = _TBlock(dim, heads)
    tb.mlp = _TSwiGLUFFN(dim, hidden)
    tb.eval()

    state = {f"blocks.0.{k}": v.detach().numpy() for k, v in tb.state_dict().items()}
    flat, skipped = convert_state_dict(state, "dinov2")
    assert skipped == [], skipped

    jb = DinoBlock(dim, heads, ffn_layer="swiglufused")
    x = np.random.RandomState(5).randn(2, 7, dim).astype(np.float32)
    var = jax.eval_shape(lambda: jb.init(jax.random.PRNGKey(0), jnp.zeros((2, 7, dim))))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), var)["params"]
    params, loaded, missed = graft_flat_params(
        params, {k[len("blocks_0/") :]: v for k, v in flat.items()}
    )
    assert missed == [], missed

    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).numpy()
    out = np.asarray(jb.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
