"""The registered segmentation models: ``cod``, ``baseline``.

Reference surface: ``cod(BaseModel)`` at /root/reference/twig/model/cod.py:35-224
and ``baseline`` at twig/model/baseline.py:35-193. Both stack HitNet on a
texture-diffusion-prompted PVTv2-b2; ``cod`` adds the SSIM texture term to the
loss (cod.py:143-145), ``baseline`` omits it (baseline.py:144) and uses the
grid-FFT diffusion variant (freq 0.5, k=3, 6 steps — baseline.py:1150,1224).

The reference accepts config args (win_size, filter_ratio, using_depth, ...)
and stores none of them (cod.py:38-46) — here they are accepted for recipe
compatibility and equally ignored, except the ones we intentionally promote
to real hyperparameters.

Mode dispatch (loss/predict/tensor, cod.py:118-224) is expressed as pure
functions over a Flax module so each mode jits separately; the reference's
inline PNG visualization side effects (cod.py:156-217) live host-side in the
eval loop (``train/loop.py``), keeping the compiled path pure.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import MODELS, export
from ..utils.image import resize_bilinear
from .hitnet import HitNet
from .losses import staged_losses, texture_ssim_loss

Dtype = Any


class CODNet(nn.Module):
    """Flax module: HitNet forward shared by loss/predict modes."""

    variant: str = "b2"
    channel: int = 32
    latent_dim: int = 24
    grid: int = 12
    freq_rate: float = 0.3
    diffusion_kernel: int = 7
    diffusion_steps: int = 4
    fft_at_grid: bool = False
    convnext_dims: tuple = (128, 256, 512, 1024)
    convnext_depths: tuple = (3, 3, 27, 3)
    remat: bool = False
    refine_iters: int = 4
    use_prompts: bool = True
    inject_prompts: bool = True  # see HitNet.inject_prompts (baseline parity)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, depth, train: bool = False):
        return HitNet(
            channel=self.channel,
            variant=self.variant,
            latent_dim=self.latent_dim,
            grid=self.grid,
            freq_rate=self.freq_rate,
            diffusion_kernel=self.diffusion_kernel,
            diffusion_steps=self.diffusion_steps,
            fft_at_grid=self.fft_at_grid,
            convnext_dims=tuple(self.convnext_dims),
            convnext_depths=tuple(self.convnext_depths),
            remat=self.remat,
            refine_iters=self.refine_iters,
            use_prompts=self.use_prompts,
            inject_prompts=self.inject_prompts,
            dtype=self.dtype,
            name="hitnet",
        )(image, depth, train)


class _SegModel:
    """Config-facing model: bundles the Flax net with its loss/predict rules."""

    use_ssim: bool = True
    net_kwargs: Dict[str, Any] = {}

    def __init__(
        self,
        win_size: Optional[int] = None,
        filter_ratio: Optional[float] = None,
        using_depth: Optional[bool] = None,
        using_sam: Optional[bool] = None,
        finetune: Optional[bool] = None,
        binary_thresh: Optional[float] = None,
        pretrain_sam: Optional[str] = None,
        head: Optional[object] = None,
        dtype: Any = jnp.bfloat16,
        use_ssim: Optional[bool] = None,
        **overrides,
    ):
        # reference-parity: the recipe's model args are accepted and unused
        # (cod.py:38-46); explicit diffusion overrides are honored.
        # ``use_ssim`` reproduces the reference's deleted cod_no_ssim
        # ablation variant as a config field (docs/ABLATIONS.md).
        if use_ssim is not None:
            self.use_ssim = bool(use_ssim)
        kwargs = dict(self.net_kwargs)
        kwargs.update(overrides)
        self.net = CODNet(dtype=dtype, **kwargs)
        if self.use_ssim and self.net.fft_at_grid and self.net.use_prompts:
            # fft_at_grid returns a GRID-sized texture (baseline's variant,
            # baseline.py:1253); the SSIM term aligns texture against the
            # full-resolution input — the combination would crash at trace
            # time with an opaque broadcast error. The reference never pairs
            # them (baseline has no SSIM); reject loudly instead.
            raise ValueError(
                "use_ssim=True is incompatible with fft_at_grid=True: the "
                "grid-FFT texture is grid-sized and cannot align against the "
                "full-resolution input (set model.use_ssim=false, as the "
                "reference baseline does)"
            )

    @property
    def frozen_param_prefixes(self) -> tuple:
        """Param-path prefixes the forward never touches — torch-DDP
        ``find_unused_parameters=True`` leaves their grads ``None`` so AdamW
        skips them entirely (PARITY.md delta 13). The optimizer zeroes their
        updates (train/optim.py::freeze_updates) so they stay bit-identical
        to init, like the reference. Only ``baseline`` has such params: its
        diffusion modules exist in the tree (checkpoint-key parity) but the
        injection path is dead (baseline.py:1436-1473)."""
        net = self.net
        # getattr: DQnet inherits this property with a DQnetNet net that has
        # no prompt fields — a raw attribute access would raise, and the
        # loop's defensive getattr(model, ...) would silently MASK it,
        # disabling freezing with no signal
        if getattr(net, "use_prompts", False) and not getattr(net, "inject_prompts", True):
            return ("hitnet/prompt_encoder", "hitnet/prompt_decoder")
        return ()

    def init(self, rng, image_shape=(1, 384, 384, 3)):
        image = jnp.zeros(image_shape, jnp.float32)
        depth = jnp.zeros(image_shape[:3] + (1,), jnp.float32)
        # jit the whole init: one compiled program instead of per-op dispatch
        # (critical over the remote-TPU tunnel where eager ops round-trip).
        init_fn = jax.jit(lambda r, im, d: self.net.init({"params": r}, im, d, train=False))
        return init_fn(rng, image, depth)

    def loss(self, variables, batch, rngs=None):
        """Train-mode forward + total loss. Returns (loss, (aux, new_mutable))."""
        outputs, new_mutable = self.net.apply(
            variables,
            batch["input"],
            batch["depth"],
            train=True,
            rngs=rngs,
            mutable=["batch_stats"],
        )
        texture, stage_preds, pred2 = outputs
        loss = staged_losses(stage_preds, pred2, batch["label"])
        aux = {"loss_seg": loss}
        if self.use_ssim and texture is not None:
            # texture is None for prompt-less variants (use_prompts=False);
            # the SSIM term has nothing to align then — skip instead of
            # crashing at trace time
            l3 = texture_ssim_loss(texture, batch["input"])
            loss = loss + l3
            aux["loss_ssim"] = l3
        aux["loss"] = loss
        return loss, (aux, new_mutable)

    def tensor(self, variables, image, depth):
        """Raw forward outputs (reference mode='tensor' — note the reference's
        branch is stale: it returns an undefined ``output`` (cod.py:220-222);
        here it returns the full (texture, stage_logits, pred2) tuple)."""
        return self.net.apply(variables, image, depth, train=False)

    def predict(self, variables, image, depth, out_size=None):
        """Eval-mode forward -> (sigmoid probability map, extras)."""
        texture, stage_preds, pred2 = self.net.apply(
            variables, image, depth, train=False
        )
        logits = stage_preds[-1] + pred2
        if out_size is not None and tuple(out_size) != tuple(logits.shape[1:3]):
            logits = resize_bilinear(logits, out_size)
        prob = jax.nn.sigmoid(logits.astype(jnp.float32))
        return prob, {"texture": texture}


@export
@MODELS.register
class cod(_SegModel):
    """Paper model: diffusion prompts + SSIM texture loss (cod.py:35-224)."""

    use_ssim = True
    net_kwargs = dict(
        freq_rate=0.3, diffusion_kernel=7, diffusion_steps=4, fft_at_grid=False
    )


@export
@MODELS.register
class baseline(_SegModel):
    """cod minus the SSIM term — and minus the prompts: the reference
    baseline CONSTRUCTS its diffusion modules (grid-FFT texture, k=3/6-step
    MessagePassing, freq_nums=0.5 — baseline.py:1150,1224,1253) but the whole
    injection path is commented out of its forward (baseline.py:1436-1473),
    so the live network is a pure HitNet. The modules are kept in the param
    tree for checkpoint-key parity; their outputs are discarded
    (``inject_prompts=False``) and DCE'd. Composition-parity proof:
    tests/test_torch_oracle.py::test_baseline_forward_matches_torch_oracle_384
    (which caught exactly this delta)."""

    use_ssim = False
    net_kwargs = dict(
        freq_rate=0.5,
        diffusion_kernel=3,
        diffusion_steps=6,
        fft_at_grid=True,
        inject_prompts=False,
    )
