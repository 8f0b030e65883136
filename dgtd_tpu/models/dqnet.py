"""DQnet — the earlier depth-prompt lineage model.

Reference: /root/reference/twig/model/dqnet.py:35-155 — HitNet decoder on a
PVTv2-b2 whose blocks receive *depth adapter* prompts instead of texture
diffusion: per stage, the depth map is resized to a fixed ``cross_size=44``
grid (dqnet.py:1130,1195), passed through ``Depth_prompt`` (dqnet.py:982-1065:
Linear depth_adapter 1->C/2, per-block lightweight MLP C/2->C/2+GELU, shared
Linear C/2->C), and each block's prompt is resized to the stage grid and
added to the tokens (dqnet.py:1199-1202). Loss = staged BCE+IoU only.

NOTE (documented divergence): the reference variant is stale — its
``Depth_prompt.forward`` references an undefined ``prompt`` because the
``lightweight_mlp`` application line is commented out (dqnet.py:1060-1063),
so the variant crashes if run. This implementation restores the evident
intent: ``prompt_i = shared_mlp(lightweight_mlp_i(depth_adapter(cues)))``.
The reference's train-time matplotlib depth dumps (dqnet.py:122-128) are
host-side concerns and intentionally omitted from the compiled path.

Structure note: ``DQnetNet`` repeats HitNet's decoder stanza (translayers,
4-iter CFM loop, SAM fusion) rather than parameterizing ``HitNet`` with an
injectable prompt source. This mirrors the reference's own organization
(three sibling model files sharing the decoder) and keeps each variant's
param tree flat and converter-stable; the duplicated stanza is ~45 lines
and pinned against the same oracle tests as HitNet's.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import MODELS, export
from ..utils.image import resize_bilinear
from .cod import _SegModel
from .hitnet import CABStack
from .layers import BasicConv2d, CAB, Conv, Dense, SAMFusion
from .losses import staged_losses
from .pvt import PVT_V2_CONFIGS, PVTv2

Dtype = Any


class DepthPrompt(nn.Module):
    """Per-stage depth prompt generator (reference Depth_prompt)."""

    embed_dim: int
    depth: int
    scale_factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cues) -> List[jnp.ndarray]:
        hidden = self.embed_dim // self.scale_factor
        adapted = Dense(hidden, init_scheme="trunc", dtype=self.dtype, name="depth_adapter")(cues)
        shared = Dense(self.embed_dim, init_scheme="trunc", dtype=self.dtype, name="shared_mlp")
        prompts = []
        for i in range(self.depth):
            h = Dense(hidden, init_scheme="trunc", dtype=self.dtype, name=f"lightweight_mlp_{i}")(adapted)
            h = nn.gelu(h, approximate=False)
            prompts.append(shared(h))
        return prompts


class DQnetNet(nn.Module):
    """HitNet decoder over a depth-prompted PVTv2 (no texture diffusion)."""

    variant: str = "b2"
    channel: int = 32
    cross_size: int = 44
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, depth, train: bool = False):
        dims, _, _, depths, _ = PVT_V2_CONFIGS[self.variant]
        ch = self.channel
        g = self.cross_size
        depth_grid = resize_bilinear(depth, (g, g))
        prompts = [
            DepthPrompt(dims[s], depths[s], dtype=self.dtype, name=f"depth_generator{s}")(depth_grid)
            for s in range(4)
        ]
        x1, x2, x3, x4 = PVTv2(variant=self.variant, dtype=self.dtype, name="backbone")(
            image, prompts, train
        )

        # same decoder as HitNet (reference dqnet Hitnet, dqnet.py:571-...)
        cim = CABStack(dtype=self.dtype, name="decoder_level1")(x1)
        x2_t = BasicConv2d(ch, 1, dtype=self.dtype, name="translayer2_1")(x2, train)
        x3_t = BasicConv2d(ch, 1, dtype=self.dtype, name="translayer3_1")(x3, train)
        x4_t = BasicConv2d(ch, 1, dtype=self.dtype, name="translayer4_1")(x4, train)

        dec4 = CABStack(dtype=self.dtype, name="decoder_level4")
        dec3 = CABStack(dtype=self.dtype, name="decoder_level3")
        dec2 = CABStack(dtype=self.dtype, name="decoder_level2")
        conv4 = BasicConv2d(ch, 3, padding=1, dtype=self.dtype, name="conv4")
        compress_out = BasicConv2d(ch, 8, stride=4, padding=2, dtype=self.dtype, name="compress_out")
        compress_out2 = BasicConv2d(ch, 1, dtype=self.dtype, name="compress_out2")
        out_cfm = Conv(1, 1, dtype=self.dtype, name="out_CFM")

        h8, w8 = x2.shape[1], x2.shape[2]
        full = (image.shape[1], image.shape[2])
        stage_preds = []
        cfm = None
        for it in range(4):
            if cfm is not None:
                x4_t = compress_out(
                    jnp.concatenate(
                        [resize_bilinear(x4_t, (h8, w8), align_corners=True, exact=False), cfm], axis=-1
                    ),
                    train,
                )
            x4_f = dec4(x4_t)
            x3_f = dec3(
                jnp.concatenate(
                    [x3_t, resize_bilinear(x4_f, (x3.shape[1], x3.shape[2]), align_corners=True, exact=False)],
                    axis=-1,
                )
            )
            if it > 0:
                x2_t = compress_out2(jnp.concatenate([x2_t, cfm], axis=-1), train)
            x2_f = dec2(
                jnp.concatenate([x2_t, resize_bilinear(x3_f, (h8, w8), align_corners=True, exact=False)], axis=-1)
            )
            cfm = conv4(x2_f, train)
            stage_preds.append(resize_bilinear(out_cfm(cfm), full))

        t2 = BasicConv2d(ch, 1, dtype=self.dtype, name="translayer2_0")(cim, train)
        t2 = resize_bilinear(t2, (h8, w8), align_corners=True, exact=False)
        sam = SAMFusion(dtype=self.dtype, name="sam")(cfm, t2)
        pred2 = resize_bilinear(Conv(1, 1, dtype=self.dtype, name="out_SAM")(sam), full)
        return None, stage_preds, pred2


@export
@MODELS.register
class DQnet(_SegModel):
    """Depth-prompt model, staged loss only (dqnet.py:35-155)."""

    use_ssim = False
    net_kwargs: dict = {}

    #: reference-parity args accepted-and-ignored like cod's (cod.py:38-46)
    _IGNORED = ("filter_ratio", "using_depth", "using_sam", "finetune", "binary_thresh", "pretrain_sam", "head")

    def __init__(self, win_size=None, dtype: Any = jnp.bfloat16, **kwargs):
        allowed = {k: v for k, v in kwargs.items() if k in ("variant", "channel", "cross_size")}
        unknown = set(kwargs) - set(allowed) - set(self._IGNORED)
        if unknown:
            # silently dropping typo'd overrides would train a default model
            raise TypeError(f"DQnet: unknown model args {sorted(unknown)}")
        self.net = DQnetNet(dtype=dtype, **allowed)
