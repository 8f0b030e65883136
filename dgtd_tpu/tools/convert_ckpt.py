"""PyTorch .pth -> dgtd_tpu .npz weight converter.

Converts the three checkpoint families the reference loads
(/root/reference/twig/model/cod.py:230-300):
  * ``pretrain/pvt_v2_b2.pth``            -> backbone (official PVTv2 keys)
  * ``pretrain/convnext_base_22k_224.pth`` -> ConvNeXt tower (official keys)
  * full training checkpoints (``epoch_N.pth`` MMEngine state_dict with
    ``hitnet.*`` keys) -> the whole model

Output: flat .npz mapping this package's '/'-joined param paths to arrays in
Flax layout (conv HWIO, linear (in,out)), consumable by
``train.hooks.graft_flat_params`` (strict=False semantics: unmatched keys are
reported, not fatal — mirroring the reference's ``load_state_dict(strict=False)``).

Usage:
    python -m dgtd_tpu.tools.convert_ckpt pvt      pvt_v2_b2.pth out.npz
    python -m dgtd_tpu.tools.convert_ckpt convnext convnext_base_22k_224.pth out.npz
    python -m dgtd_tpu.tools.convert_ckpt full     epoch_50.pth out.npz
    python -m dgtd_tpu.tools.convert_ckpt dinov2   dinov2_vitl14_pretrain.pth out.npz
    python -m dgtd_tpu.tools.convert_ckpt dpt_head dinov2_vitl14_nyu_dpt_head.pth out.npz

The INVERSE direction also works — trained dgtd_tpu checkpoints run on the
reference torch stack (bit-exact round trip, tests/test_convert_ckpt.py):
    python -m dgtd_tpu.tools.convert_ckpt export work_dir/epoch_100 out.pth [template_ref.pth]

The last two feed the offline depther (models/dinov2.py + models/dpt.py,
reference dino.py:104-138); see tools/depth_gen.py --estimator dinov2.
"""

from __future__ import annotations

import re
import sys
from typing import Callable, Dict, Optional, Tuple

import numpy as np


def _conv_w(a: np.ndarray) -> np.ndarray:
    """torch conv (O, I/g, kh, kw) -> flax (kh, kw, I/g, O)."""
    return np.transpose(a, (2, 3, 1, 0))


def _lin_w(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (1, 0))


def _ident(a: np.ndarray) -> np.ndarray:
    return a


# ---------------------------------------------------------------------------
# PVTv2 official checkpoint -> backbone subtree
# ---------------------------------------------------------------------------


def map_pvt_key(key: str) -> Optional[Tuple[str, Callable]]:
    """Official PVTv2 state-dict key -> (relative path, transform)."""
    m = re.match(r"patch_embed(\d)\.proj\.(weight|bias)$", key)
    if m:
        s, wb = m.groups()
        if wb == "weight":
            return f"patch_embed{s}/Conv_0/Conv_0/kernel", _conv_w
        return f"patch_embed{s}/Conv_0/Conv_0/bias", _ident
    m = re.match(r"patch_embed(\d)\.norm\.(weight|bias)$", key)
    if m:
        s, wb = m.groups()
        tgt = "scale" if wb == "weight" else "bias"
        return f"patch_embed{s}/LayerNorm_0/LayerNorm_0/{tgt}", _ident
    m = re.match(r"norm(\d)\.(weight|bias)$", key)
    if m:
        s, wb = m.groups()
        tgt = "scale" if wb == "weight" else "bias"
        return f"norm{s}/LayerNorm_0/{tgt}", _ident
    m = re.match(r"block(\d)\.(\d+)\.(.+)$", key)
    if m:
        s, i, rest = m.groups()
        base = f"block{s}_{i}"
        inner = _map_pvt_block_key(rest)
        if inner is None:
            return None
        path, tf = inner
        return f"{base}/{path}", tf
    return None  # head.*, cls tokens etc.


def _map_pvt_block_key(rest: str) -> Optional[Tuple[str, Callable]]:
    table = {
        "norm1.weight": ("LayerNorm_0/LayerNorm_0/scale", _ident),
        "norm1.bias": ("LayerNorm_0/LayerNorm_0/bias", _ident),
        "norm2.weight": ("LayerNorm_1/LayerNorm_1/scale", _ident),
        "norm2.bias": ("LayerNorm_1/LayerNorm_1/bias", _ident),
        "attn.q.weight": ("SRAttention_0/Dense_0/Dense_0/kernel", _lin_w),
        "attn.q.bias": ("SRAttention_0/Dense_0/Dense_0/bias", _ident),
        "attn.kv.weight": ("SRAttention_0/Dense_1/Dense_1/kernel", _lin_w),
        "attn.kv.bias": ("SRAttention_0/Dense_1/Dense_1/bias", _ident),
        "attn.proj.weight": ("SRAttention_0/Dense_2/Dense_2/kernel", _lin_w),
        "attn.proj.bias": ("SRAttention_0/Dense_2/Dense_2/bias", _ident),
        "attn.sr.weight": ("SRAttention_0/Conv_0/Conv_0/kernel", _conv_w),
        "attn.sr.bias": ("SRAttention_0/Conv_0/Conv_0/bias", _ident),
        "attn.norm.weight": ("SRAttention_0/LayerNorm_0/LayerNorm_0/scale", _ident),
        "attn.norm.bias": ("SRAttention_0/LayerNorm_0/LayerNorm_0/bias", _ident),
        "mlp.fc1.weight": ("MixFFN_0/Dense_0/Dense_0/kernel", _lin_w),
        "mlp.fc1.bias": ("MixFFN_0/Dense_0/Dense_0/bias", _ident),
        "mlp.dwconv.dwconv.weight": ("MixFFN_0/Conv_0/Conv_0/kernel", _conv_w),
        "mlp.dwconv.dwconv.bias": ("MixFFN_0/Conv_0/Conv_0/bias", _ident),
        "mlp.fc2.weight": ("MixFFN_0/Dense_1/Dense_1/kernel", _lin_w),
        "mlp.fc2.bias": ("MixFFN_0/Dense_1/Dense_1/bias", _ident),
    }
    return table.get(rest)


# ---------------------------------------------------------------------------
# ConvNeXt official checkpoint -> encoder2 subtree
# ---------------------------------------------------------------------------


def map_convnext_key(key: str) -> Optional[Tuple[str, Callable]]:
    m = re.match(r"downsample_layers\.0\.(0|1)\.(weight|bias)$", key)
    if m:
        idx, wb = m.groups()
        if idx == "0":  # stem conv
            return (
                f"stem_conv/Conv_0/{'kernel' if wb == 'weight' else 'bias'}",
                _conv_w if wb == "weight" else _ident,
            )
        return (f"stem_norm/LayerNorm_0/{'scale' if wb == 'weight' else 'bias'}", _ident)
    m = re.match(r"downsample_layers\.(\d)\.(0|1)\.(weight|bias)$", key)
    if m:
        i, idx, wb = m.groups()
        if idx == "0":  # LN first in non-stem downsample
            return (f"down_norm{i}/LayerNorm_0/{'scale' if wb == 'weight' else 'bias'}", _ident)
        return (
            f"down_conv{i}/Conv_0/{'kernel' if wb == 'weight' else 'bias'}",
            _conv_w if wb == "weight" else _ident,
        )
    m = re.match(r"stages\.(\d)\.(\d+)\.(.+)$", key)
    if m:
        i, j, rest = m.groups()
        base = f"stage{i}_block{j}"
        table = {
            "dwconv.weight": ("Conv_0/Conv_0/kernel", _conv_w),
            "dwconv.bias": ("Conv_0/Conv_0/bias", _ident),
            "norm.weight": ("LayerNorm_0/LayerNorm_0/scale", _ident),
            "norm.bias": ("LayerNorm_0/LayerNorm_0/bias", _ident),
            "pwconv1.weight": ("Dense_0/Dense_0/kernel", _lin_w),
            "pwconv1.bias": ("Dense_0/Dense_0/bias", _ident),
            "pwconv2.weight": ("Dense_1/Dense_1/kernel", _lin_w),
            "pwconv2.bias": ("Dense_1/Dense_1/bias", _ident),
            "gamma": ("gamma", _ident),
        }
        inner = table.get(rest)
        if inner is None:
            return None
        return f"{base}/{inner[0]}", inner[1]
    # reference ShapePropEncoder FPN head (present in full checkpoints)
    m = re.match(r"convs\.(\d)\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        return (
            f"lateral{i}/Conv_0/{'kernel' if wb == 'weight' else 'bias'}",
            _conv_w if wb == "weight" else _ident,
        )
    m = re.match(r"fusion_conv\.(weight|bias)$", key)
    if m:
        wb = m.group(1)
        return (
            f"fusion/Conv_0/{'kernel' if wb == 'weight' else 'bias'}",
            _conv_w if wb == "weight" else _ident,
        )
    return None


# ---------------------------------------------------------------------------
# Full-model checkpoint (hitnet.* MMEngine state dict) -> whole tree
# ---------------------------------------------------------------------------

_CAB_TABLE = {
    "body.0.weight": ("Conv_0/Conv_0/kernel", _conv_w),
    "body.1.weight": ("PReLU_0/alpha", _ident),
    "body.2.weight": ("Conv_1/Conv_1/kernel", _conv_w),
    "CA.conv_du.0.weight": ("CALayer_0/Conv_0/Conv_0/kernel", _conv_w),
    "CA.conv_du.2.weight": ("CALayer_0/Conv_1/Conv_1/kernel", _conv_w),
}


def _map_basicconv(rel: str, base: str) -> Optional[Tuple[str, Callable]]:
    table = {
        "conv.weight": (f"{base}/Conv_0/Conv_0/kernel", _conv_w),
        "bn.weight": (f"{base}/BatchNorm_0/scale", _ident),
        "bn.bias": (f"{base}/BatchNorm_0/bias", _ident),
    }
    return table.get(rel)


def _map_basicconv_stats(rel: str, base: str) -> Optional[Tuple[str, Callable]]:
    table = {
        "bn.running_mean": (f"{base}/BatchNorm_0/mean", _ident),
        "bn.running_var": (f"{base}/BatchNorm_0/var", _ident),
    }
    return table.get(rel)


_HITNET_BASICCONV = {
    "Translayer2_0": "translayer2_0",
    "Translayer2_1": "translayer2_1",
    "Translayer3_1": "translayer3_1",
    "Translayer4_1": "translayer4_1",
    "conv4": "conv4",
    "compress_out": "compress_out",
    "compress_out2": "compress_out2",
}

_SAM_DENSE = {
    "fc.0.weight": ("hitnet/sam/Dense_0/Dense_0/kernel", _lin_w),
    "fc.2.weight": ("hitnet/sam/Dense_1/Dense_1/kernel", _lin_w),
    "fc_wight.0.weight": ("hitnet/sam/Dense_2/Dense_2/kernel", _lin_w),
    "fc_wight.2.weight": ("hitnet/sam/Dense_3/Dense_3/kernel", _lin_w),
}

_DEC_LEVELS = {
    "decoder_level1": "decoder_level1",
    "decoder_level4": "decoder_level4",
    "decoder_level3": "decoder_level3",
    "decoder_level2": "decoder_level2",
}


def map_full_key(key: str, collection: str = "params") -> Optional[Tuple[str, Callable]]:
    """Full reference state-dict key -> (path under the model root, transform).

    ``collection``: 'params' or 'batch_stats' (BN running stats live in the
    latter)."""
    if key.startswith("hitnet."):
        key = key[len("hitnet.") :]
    stats = collection == "batch_stats"

    # ---- backbone subtree ----
    if key.startswith("backbone.prompt_encoder."):
        rest = key[len("backbone.prompt_encoder.") :]
        if rest.startswith("encoder2."):
            if stats:
                return None
            inner = map_convnext_key(rest[len("encoder2.") :])
            if inner is None:
                return None
            return f"hitnet/prompt_encoder/encoder2/{inner[0]}", inner[1]
        if stats:
            return None
        table = {
            "propagation_weight_regressor.reg.weight": (
                "hitnet/prompt_encoder/weight_regressor/Conv_0/kernel",
                _conv_w,
            ),
            "propagation_weight_regressor.reg.bias": (
                "hitnet/prompt_encoder/weight_regressor/Conv_0/bias",
                _ident,
            ),
            "encoder1.weight": ("hitnet/prompt_encoder/encoder1/Conv_0/kernel", _conv_w),
            "encoder1.bias": ("hitnet/prompt_encoder/encoder1/Conv_0/bias", _ident),
            "message_passing.conv.weight": (
                "hitnet/prompt_encoder/message_passing/Conv_0/Conv_0/kernel",
                _conv_w,
            ),
            "message_passing.conv.bias": (
                "hitnet/prompt_encoder/message_passing/Conv_0/Conv_0/bias",
                _ident,
            ),
        }
        return table.get(rest)
    m = re.match(r"backbone\.prompt_decoder\.(\d)\.decoder\.(\d+)\.decoder\.(\d)\.(weight|bias)$", key)
    if m:
        if stats:
            return None
        s, i, c, wb = m.groups()
        conv_idx = int(c) // 2  # Sequential indices 0,2,4 -> convs 0,1,2
        return (
            f"hitnet/prompt_decoder{s}/decoder{i}/Conv_{conv_idx}/Conv_{conv_idx}/"
            + ("kernel" if wb == "weight" else "bias"),
            _conv_w if wb == "weight" else _ident,
        )
    if key.startswith("backbone."):
        if stats:
            return None
        inner = map_pvt_key(key[len("backbone.") :])
        if inner is None:
            return None
        return f"hitnet/backbone/{inner[0]}", inner[1]

    # ---- Hitnet decoder subtree ----
    for tname, mine in _HITNET_BASICCONV.items():
        if key.startswith(tname + "."):
            rel = key[len(tname) + 1 :]
            inner = (_map_basicconv_stats if stats else _map_basicconv)(rel, f"hitnet/{mine}")
            return inner
    for tname, mine in _DEC_LEVELS.items():
        m = re.match(rf"{tname}\.(\d)\.(.+)$", key)
        if m:
            if stats:
                return None
            i, rest = m.groups()
            inner = _CAB_TABLE.get(rest)
            if inner is None:
                return None
            return f"hitnet/{mine}/cab{i}/{inner[0]}", inner[1]
    if key.startswith("SAM."):
        if stats:
            return None
        inner = _SAM_DENSE.get(key[len("SAM.") :])
        if inner is None:
            return None
        return inner
    table = {
        "out_SAM.weight": ("hitnet/out_SAM/Conv_0/kernel", _conv_w),
        "out_SAM.bias": ("hitnet/out_SAM/Conv_0/bias", _ident),
        "out_CFM.weight": ("hitnet/out_CFM/Conv_0/kernel", _conv_w),
        "out_CFM.bias": ("hitnet/out_CFM/Conv_0/bias", _ident),
    }
    if not stats and key in table:
        return table[key]
    return None  # ca/sa/ChannelAttention etc: registered-but-unused reference modules


# ---------------------------------------------------------------------------
# DINOv2 backbone + DPT depth head (the offline-depther checkpoints,
# reference dino.py:104-138: dinov2_vit*14_pretrain.pth and
# dinov2_vit*14_nyu_dpt_head.pth)
# ---------------------------------------------------------------------------


def _convT_w(a: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O) for the
    non-overlapping einsum formulation in models/dpt.py."""
    return np.transpose(a, (2, 3, 0, 1))


def map_dinov2_key(key: str) -> Optional[Tuple[str, Callable]]:
    """Official DINOv2 backbone state-dict key -> DinoViT param path."""
    if key in ("cls_token", "pos_embed"):
        return key, _ident
    m = re.match(r"patch_embed\.proj\.(weight|bias)$", key)
    if m:
        wb = m.group(1)
        return (
            f"patch_embed/Conv_0/{'kernel' if wb == 'weight' else 'bias'}",
            _conv_w if wb == "weight" else _ident,
        )
    m = re.match(r"norm\.(weight|bias)$", key)
    if m:
        return f"norm/LayerNorm_0/{'scale' if m.group(1) == 'weight' else 'bias'}", _ident
    m = re.match(r"blocks\.(\d+)\.(.+)$", key)
    if m:
        i, rest = m.groups()
        table = {
            "norm1.weight": ("norm1/LayerNorm_0/scale", _ident),
            "norm1.bias": ("norm1/LayerNorm_0/bias", _ident),
            "norm2.weight": ("norm2/LayerNorm_0/scale", _ident),
            "norm2.bias": ("norm2/LayerNorm_0/bias", _ident),
            "attn.qkv.weight": ("attn/qkv/Dense_0/kernel", _lin_w),
            "attn.qkv.bias": ("attn/qkv/Dense_0/bias", _ident),
            "attn.proj.weight": ("attn/proj/Dense_0/kernel", _lin_w),
            "attn.proj.bias": ("attn/proj/Dense_0/bias", _ident),
            "ls1.gamma": ("ls1/gamma", _ident),
            "ls2.gamma": ("ls2/gamma", _ident),
            "mlp.fc1.weight": ("mlp_fc1/Dense_0/kernel", _lin_w),
            "mlp.fc1.bias": ("mlp_fc1/Dense_0/bias", _ident),
            "mlp.fc2.weight": ("mlp_fc2/Dense_0/kernel", _lin_w),
            "mlp.fc2.bias": ("mlp_fc2/Dense_0/bias", _ident),
            # ViT-g/14 fused-SwiGLU FFN (hub ffn_layer="swiglufused")
            "mlp.w12.weight": ("mlp_w12/Dense_0/kernel", _lin_w),
            "mlp.w12.bias": ("mlp_w12/Dense_0/bias", _ident),
            "mlp.w3.weight": ("mlp_w3/Dense_0/kernel", _lin_w),
            "mlp.w3.bias": ("mlp_w3/Dense_0/bias", _ident),
        }
        inner = table.get(rest)
        if inner is None:
            return None
        return f"blocks_{i}/{inner[0]}", inner[1]
    return None  # mask_token, register_tokens (inference-unused)


def map_dpt_head_key(key: str) -> Optional[Tuple[str, Callable]]:
    """Official DPT depth-head key (mmseg schema) -> DPTHead param path.

    Accepts keys with or without the release's ``decode_head.`` prefix."""
    if key.startswith("decode_head."):
        key = key[len("decode_head.") :]
    if key.startswith("backbone."):
        return None  # head checkpoints never carry backbone weights; guard anyway
    m = re.match(r"reassemble_blocks\.readout_projects\.(\d)\.0\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        return (
            f"reassemble_blocks/readout_projects_{i}/Dense_0/"
            + ("kernel" if wb == "weight" else "bias"),
            _lin_w if wb == "weight" else _ident,
        )
    m = re.match(r"reassemble_blocks\.projects\.(\d)\.conv\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        return (
            f"reassemble_blocks/projects_{i}/Conv_0/" + ("kernel" if wb == "weight" else "bias"),
            _conv_w if wb == "weight" else _ident,
        )
    m = re.match(r"reassemble_blocks\.resize_layers\.(\d)\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        if i in ("0", "1"):  # ConvTranspose2d x4 / x2
            return (
                f"reassemble_blocks/resize_layers_{i}/" + ("kernel" if wb == "weight" else "bias"),
                _convT_w if wb == "weight" else _ident,
            )
        if i == "3":  # stride-2 conv
            return (
                f"reassemble_blocks/resize_layers_3/Conv_0/"
                + ("kernel" if wb == "weight" else "bias"),
                _conv_w if wb == "weight" else _ident,
            )
        return None  # index 2 is Identity
    m = re.match(r"convs\.(\d)\.conv\.weight$", key)
    if m:
        return f"convs_{m.group(1)}/Conv_0/kernel", _conv_w
    m = re.match(
        r"fusion_blocks\.(\d)\.res_conv_unit(\d)\.conv(\d)\.conv\.(weight|bias)$", key
    )
    if m:
        i, u, c, wb = m.groups()
        return (
            f"fusion_blocks_{i}/res_conv_unit{u}/conv{c}/Conv_0/"
            + ("kernel" if wb == "weight" else "bias"),
            _conv_w if wb == "weight" else _ident,
        )
    m = re.match(r"fusion_blocks\.(\d)\.project\.conv\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        return (
            f"fusion_blocks_{i}/project/Conv_0/" + ("kernel" if wb == "weight" else "bias"),
            _conv_w if wb == "weight" else _ident,
        )
    m = re.match(r"(project|conv_depth)\.(?:conv\.)?(weight|bias)$", key)
    if m:
        name, wb = m.groups()
        return (
            f"{name}/Conv_0/" + ("kernel" if wb == "weight" else "bias"),
            _conv_w if wb == "weight" else _ident,
        )
    return None  # loss buffers etc.


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


_WRAPPER_RE = re.compile(r"(Dense|Conv|LayerNorm)_(\d+)/(Dense|Conv|LayerNorm)_(\d+)")


def _normalize_path(path: str) -> str:
    """Inner auto-named module of a wrapper is always index 0: map
    ``X_i/X_i`` (table convenience form) to the real ``X_i/X_0``."""
    return _WRAPPER_RE.sub(lambda m: f"{m.group(1)}_{m.group(2)}/{m.group(3)}_0", path)


def convert_state_dict(
    state: Dict[str, np.ndarray], kind: str
) -> Tuple[Dict[str, np.ndarray], list]:
    """Returns (flat npz mapping, skipped keys)."""
    out: Dict[str, np.ndarray] = {}
    skipped = []
    for key, val in state.items():
        val = np.asarray(val)
        if kind == "pvt":
            hit = map_pvt_key(key)
        elif kind == "convnext":
            hit = map_convnext_key(key)
        elif kind == "dinov2":
            hit = map_dinov2_key(key)
        elif kind == "dpt_head":
            hit = map_dpt_head_key(key)
        elif kind == "full":
            hit = map_full_key(key, "params")
            if hit is None:
                hit = map_full_key(key, "batch_stats")
                if hit is not None:
                    path, tf = hit
                    out["batch_stats/" + _normalize_path(path)] = tf(val)
                    continue
        else:
            raise ValueError(kind)
        if hit is None:
            skipped.append(key)
            continue
        path, tf = hit
        out[_normalize_path(path)] = tf(val)
    return out, skipped


# ---------------------------------------------------------------------------
# Inverse direction: dgtd_tpu checkpoint -> reference-schema state dict.
# Every transform in the full map is a pure transposition, so the same key
# tables drive both directions; the template (a reference state_dict, e.g.
# random-init via tools/ref_oracle.py) supplies the key universe plus values
# for the reference's dead modules (ca/sa/adaptor/num_batches_tracked),
# which have no counterpart in our tree.
# ---------------------------------------------------------------------------

_INVERSE_TF = {
    _conv_w: lambda a: np.transpose(a, (3, 2, 0, 1)),
    _lin_w: _lin_w,  # self-inverse
    _ident: _ident,
}


def export_state_dict(
    flat: Dict[str, np.ndarray],
    template: Dict[str, np.ndarray],
    allow_missing: bool = False,
) -> Tuple[Dict[str, np.ndarray], list]:
    """Fill a reference-schema ``template`` state dict from our flat tree.

    ``flat``: {'params/...': array, 'batch_stats/...': array} ('params/'
    prefix optional — the ``convert_ckpt full`` bare layout is accepted).
    Returns (state_dict_arrays, keys_left_at_template_values,
    mapped_keys_missing_source). A template key that IS mapped but has no
    source in ``flat`` (partial/mismatched checkpoint) raises unless
    ``allow_missing`` — silently exporting template values there would
    produce a cleanly-loading .pth full of init weights.
    Trained dgtd_tpu weights exported this way run on the ACTUAL reference
    torch stack (validated bit-exact round-trip in tests/test_convert_ckpt.py).
    """
    flat = {
        k if k.startswith(("params/", "batch_stats/")) else f"params/{k}": np.asarray(v)
        for k, v in flat.items()
    }
    out: Dict[str, np.ndarray] = {}
    left = []
    missing_src = []
    for rkey, tval in template.items():
        hit = map_full_key(rkey, "params")
        prefix = "params/"
        if hit is None:
            hit = map_full_key(rkey, "batch_stats")
            prefix = "batch_stats/"
        if hit is None:
            out[rkey] = np.asarray(tval)
            left.append(rkey)
            continue
        src = flat.get(prefix + _normalize_path(hit[0]))
        if src is None:
            out[rkey] = np.asarray(tval)
            left.append(rkey)
            missing_src.append(rkey)
            continue
        arr = _INVERSE_TF[hit[1]](src)
        tshape = tuple(np.asarray(tval).shape)
        if arr.shape != tshape:
            raise ValueError(
                f"export: {rkey} expects shape {tshape}, our tree has {arr.shape}"
            )
        out[rkey] = arr
    if missing_src and not allow_missing:
        raise ValueError(
            f"export: {len(missing_src)} mapped keys have no source in the "
            f"checkpoint (first: {missing_src[:5]}) — the source tree is "
            "partial or from a different model config; pass --allow-missing "
            "to export template values for them anyway"
        )
    return out, left, missing_src


def _load_flat_ours(path: str) -> Dict[str, np.ndarray]:
    """Our checkpoint (orbax dir / trainer npz / convert-full npz) as a flat
    {'params/...', 'batch_stats/...'} mapping (hooks.py owns the layout
    contract; export_state_dict re-normalizes bare keys defensively)."""
    from ..train.hooks import load_flat_checkpoint

    return load_flat_checkpoint(path)


def main(argv=None):
    argv = argv or sys.argv[1:]
    kinds = ("pvt", "convnext", "full", "dinov2", "dpt_head")
    if argv and argv[0] == "export":
        allow_missing = "--allow-missing" in argv
        argv = [a for a in argv if a != "--allow-missing"]
        if len(argv) not in (3, 4):
            print(
                "usage: convert_ckpt export <ours.npz|orbax_dir> <out.pth> "
                "[template_ref.pth] [--allow-missing]\n(no template: a "
                "random-init reference state_dict is built via "
                "tools/ref_oracle.py)"
            )
            sys.exit(1)
        import torch

        flat = _load_flat_ours(argv[1])
        if len(argv) == 4:
            tmpl = torch.load(argv[3], map_location="cpu", weights_only=False)
            for wrap in ("model", "state_dict"):
                if isinstance(tmpl, dict) and wrap in tmpl:
                    tmpl = tmpl[wrap]
            template = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in tmpl.items()}
        else:
            from .ref_oracle import load_reference_cod

            template = {
                k: v.numpy() for k, v in load_reference_cod().cod().state_dict().items()
            }
        out, left, missing = export_state_dict(flat, template, allow_missing=allow_missing)
        # as_tensor(copy) keeps 0-d counters 0-d (ascontiguousarray promotes
        # scalars to shape-(1,), which torch load_state_dict then rejects)
        torch.save({k: torch.as_tensor(np.array(v)) for k, v in out.items()}, argv[2])
        dead = len(left) - len(missing)
        print(f"exported {len(out) - len(left)} tensors -> {argv[2]}; "
              f"{dead} left at template values (dead modules)")
        if missing:
            print(
                f"WARNING: {len(missing)} LIVE keys had no source in the "
                f"checkpoint and carry template values (first: {missing[:5]}) "
                "— the exported model is partially init-weighted"
            )
        return
    if len(argv) != 3 or argv[0] not in kinds:
        print(__doc__)
        sys.exit(1)
    kind, src, dst = argv
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    for wrap in ("model", "state_dict"):
        if isinstance(ckpt, dict) and wrap in ckpt:
            ckpt = ckpt[wrap]
    state = {k: v.numpy() for k, v in ckpt.items() if hasattr(v, "numpy")}
    out, skipped = convert_state_dict(state, kind)
    np.savez(dst, **out)
    print(f"converted {len(out)} tensors -> {dst}; skipped {len(skipped)}")
    for k in skipped[:20]:
        print("  skipped:", k)


if __name__ == "__main__":
    main()
