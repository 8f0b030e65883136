"""Optimizer construction: AdamW + cosine schedule + per-path lr multipliers.

Reference: ``optim_wrapper`` in config/cod.yml:56-101 — AdamW lr 5e-4 wd 0.1
with MMEngine ``paramwise_cfg.custom_keys`` lr multipliers (0.2 for
``hitnet.backbone`` — which in the reference contains the prompt modules —
and 0.02 for the ConvNeXt ``encoder2`` tower), CosineAnnealingLR with
T_max = max_epochs stepped per epoch (config/cod.yml:112-116), and AMP
(AmpOptimWrapper, config/cod.yml:58) which on TPU becomes bf16 compute with
fp32 params/optimizer state — no loss scaling needed.

The layer-decay constructor surface (twig/optimizer/layer_decay.py:9-115,
registered but commented out of the recipes) is provided in
``train/layer_decay.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

#: reference custom_keys mapping translated to this package's param tree.
#: In the reference, prompt_encoder/prompt_decoder live INSIDE hitnet.backbone
#: (cod.py:1395-1396) so the 0.2 backbone multiplier covers them; the ConvNeXt
#: tower (encoder2) is further reduced to 0.02. Longest-prefix-match wins,
#: like MMEngine custom_keys.
DEFAULT_LR_MULT_KEYS: Dict[str, float] = {
    "hitnet/backbone": 0.2,
    "hitnet/prompt_encoder": 0.2,
    "hitnet/prompt_decoder": 0.2,
    "hitnet/prompt_encoder/encoder2/stem": 0.02,
    "hitnet/prompt_encoder/encoder2/down": 0.02,
    "hitnet/prompt_encoder/encoder2/stage": 0.02,
}


def path_lr_mult(path_str: str, custom_keys: Dict[str, float]) -> float:
    best_len, mult = -1, 1.0
    for key, m in custom_keys.items():
        if path_str.startswith(key) or ("/" + key) in path_str:
            if len(key) > best_len:
                best_len, mult = len(key), m
    return mult


def build_lr_mults(params, custom_keys: Optional[Dict[str, float]] = None):
    """Pytree of per-leaf lr multipliers, matched on '/'-joined param paths."""
    keys = custom_keys if custom_keys is not None else DEFAULT_LR_MULT_KEYS
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: path_lr_mult(_keypath_str(kp), keys), params
    )


def _keypath_str(kp) -> str:
    """'/'-joined param path from a tree_map_with_path key path."""
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def scale_by_lr_mults(mults) -> optax.GradientTransformation:
    """Per-leaf update scaling == MMEngine per-group lr multipliers."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, mults), state

    return optax.GradientTransformation(init_fn, update_fn)


def stochastic_round_bf16(x: jnp.ndarray, key) -> jnp.ndarray:
    """Stochastically round f32 → bf16 (exact bit-level construction).

    bf16 is f32 with the low 16 mantissa bits dropped; adding 16 uniform
    random bits before truncation rounds each value up with probability
    equal to its truncated fraction — an unbiased quantizer. Plain
    round-to-nearest would freeze the AdamW EMAs: with b2=0.999 the v
    increment is ~1e-3 of the running value, far below bf16's ~2^-8
    relative resolution, so every increment rounds away.
    """
    x32 = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint32) >> 16
    rounded_bits = (bits + rnd) & jnp.uint32(0xFFFF0000)
    rounded = jax.lax.bitcast_convert_type(rounded_bits, jnp.float32)
    # Non-finite values must pass through untouched: the +rnd carry can
    # propagate through a NaN mantissa into the exponent/sign (0x7FFFFFFF
    # NaN → -0.0), silently laundering a diverged second moment into a
    # finite value and hiding the divergence from the loss/debug_nans.
    return jnp.where(jnp.isfinite(x32), rounded, x32).astype(jnp.bfloat16)


class ScaleByAdamBf16State(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_bf16(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Adam whose m/v EMAs are STORED in bf16 (halving the optimizer-state
    HBM traffic — the train-step profile's multiply_add slice) but COMPUTED
    in f32, with stochastic rounding on the state writes so the EMAs stay
    unbiased. Math matches optax.scale_by_adam otherwise. Flag surface:
    ``build_optimizer(bf16_state=True)`` / recipe ``optim_wrapper.bf16_state``
    / ``bench.py --bf16-opt``."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16)
        return ScaleByAdamBf16State(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        # deterministic per-(step, leaf) rounding keys — fixed seed so runs
        # are reproducible; the noise only dithers the last mantissa bit.
        # rbg impl: the TPU hardware RNG — threefry bits for every v leaf
        # cost more VPU time than the bf16 states save in HBM traffic.
        base = jax.random.fold_in(
            jax.random.key(0x5EED, impl="rbg" if jax.default_backend() == "tpu" else None),
            count,
        )
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c

        grads, treedef = jax.tree_util.tree_flatten(updates)
        keys = jax.random.split(base, max(len(grads), 1))
        mu_flat = jax.tree_util.tree_leaves(state.mu)
        nu_flat = jax.tree_util.tree_leaves(state.nu)
        out_leaves, mu_leaves, nu_leaves = [], [], []
        for i, (g, m, v) in enumerate(zip(grads, mu_flat, nu_flat)):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            out_leaves.append((m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps))
            # m: nearest rounding suffices — its per-step increment is
            # (1-b1)=0.1 of the running value, well inside bf16's ~2^-8
            # relative resolution. v's increment is (1-b2)=1e-3 — below
            # resolution, so v NEEDS the stochastic rounding to stay live.
            mu_leaves.append(m32.astype(jnp.bfloat16))
            nu_leaves.append(stochastic_round_bf16(v32, keys[i]))
        new_updates = jax.tree_util.tree_unflatten(treedef, out_leaves)
        new_state = ScaleByAdamBf16State(
            count=count,
            mu=jax.tree_util.tree_unflatten(treedef, mu_leaves),
            nu=jax.tree_util.tree_unflatten(treedef, nu_leaves),
        )
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def build_freeze_mask(params, prefixes: Tuple[str, ...]):
    """Pytree of python bools: True = leaf path starts with a frozen prefix."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: any(_keypath_str(kp).startswith(p) for p in prefixes), params
    )


def freeze_updates(freeze_mask) -> optax.GradientTransformation:
    """Zero the updates of frozen leaves — torch-DDP ``find_unused_parameters``
    parity (PARITY.md delta 13): params the forward never touches get ``None``
    grads under DDP, so torch AdamW skips them ENTIRELY (no step, no decay).
    optax sees exact-zero grads instead, and decoupled weight decay would
    still decay them; zeroing the final update keeps them bit-identical to
    init, like the reference. Sits LAST in the chain so it composes with
    ``optax.flatten`` and the lr-mult scaling."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (
            jax.tree.map(
                lambda u, f: jnp.zeros_like(u) if f else u, updates, freeze_mask
            ),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def cosine_epoch_schedule(
    base_lr: float, max_epochs: int, steps_per_epoch: int, eta_min: float = 0.0
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """CosineAnnealingLR stepped per epoch (by_epoch=True recipe parity)."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, max_epochs)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / max_epochs)
        )

    return schedule


def build_optimizer(
    params,
    base_lr: float = 5e-4,
    weight_decay: float = 0.1,
    max_epochs: int = 100,
    steps_per_epoch: int = 1000,
    custom_keys: Optional[Dict[str, float]] = None,
    betas: Tuple[float, float] = (0.9, 0.999),
    grad_clip: Optional[float] = None,
    grad_clip_norm: Optional[float] = None,
    flatten: bool = False,
    frozen_prefixes: Tuple[str, ...] = (),
    bf16_state: bool = False,
) -> optax.GradientTransformation:
    """``flatten``: run the AdamW core over one concatenated parameter vector
    (optax.flatten) — collapses the ~880 per-leaf update ops into a handful
    of big fused ones (the train-step profile shows a long tail of tiny
    optimizer fusions). The per-path lr multipliers stay OUTSIDE the
    flattened core so they keep operating on the named tree.

    ``frozen_prefixes``: param-path prefixes whose updates are zeroed —
    reference ``find_unused_parameters=True`` DDP parity for
    constructed-but-never-called modules (see :func:`freeze_updates`)."""
    schedule = cosine_epoch_schedule(base_lr, max_epochs, steps_per_epoch)
    mults = build_lr_mults(params, custom_keys)
    chain = []
    if grad_clip:
        chain.append(optax.clip(grad_clip))
    if grad_clip_norm:
        # MMEngine clip_grad {max_norm: X} == torch clip_grad_norm_ (global)
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if bf16_state:
        # AdamW decomposition with bf16 m/v (scale_by_adam_bf16): same
        # decoupled-decay placement as optax.adamw
        chain += [
            scale_by_adam_bf16(b1=betas[0], b2=betas[1]),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(schedule),
        ]
    else:
        chain.append(
            optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
        )
    core = optax.chain(*chain)
    if flatten:
        core = optax.flatten(core)
    tail = [scale_by_lr_mults(mults)]
    if frozen_prefixes:
        tail.append(freeze_updates(build_freeze_mask(params, tuple(frozen_prefixes))))
    return optax.chain(core, *tail)


def build_from_config(
    params,
    optim_cfg: dict,
    max_epochs: int,
    steps_per_epoch: int,
    model_cfg: Optional[dict] = None,
    frozen_prefixes: Tuple[str, ...] = (),
):
    """Construct from a reference-schema ``optim_wrapper`` block."""
    opt = optim_cfg.get("optimizer", {})
    assert opt.get("type", "AdamW") == "AdamW", "only AdamW recipes supported"
    paramwise = optim_cfg.get("paramwise_cfg") or {}
    custom = paramwise.get("custom_keys")
    custom_keys = None
    if optim_cfg.get("constructor"):
        from ..core.registry import OPTIM_CONSTRUCTORS

        ctor = OPTIM_CONSTRUCTORS.get(optim_cfg["constructor"])
        custom_keys = ctor(paramwise, model_cfg or {})
        custom = None
    if custom:
        # translate reference dotted keys to this package's tree paths
        custom_keys = {}
        implicit = set()  # expansion keys we add ourselves — exempt from the
        # zero-match typo guard below (a model variant may lack the node)
        for key, spec in custom.items():
            mult = spec.get("lr_mult", 1.0) if isinstance(spec, dict) else float(spec)
            key = key.replace("hitnet.backbone.prompt_encoder", "hitnet/prompt_encoder")
            key = key.replace("hitnet.backbone", "hitnet/backbone")
            key = key.replace(".", "/")
            if key == "hitnet/backbone":
                # reference: prompt modules live under backbone — cover them
                for extra in ("hitnet/prompt_encoder", "hitnet/prompt_decoder"):
                    if extra not in custom_keys:
                        custom_keys[extra] = mult
                        implicit.add(extra)
            if key.endswith("encoder2/downsample_layers"):
                for k2 in ("stem", "down"):
                    custom_keys[key.replace("downsample_layers", k2)] = mult
                continue
            if "encoder2/stages/" in key:
                idx = key.rsplit("/", 1)[-1]
                custom_keys[key.replace(f"stages/{idx}", f"stage{idx}")] = mult
                continue
            custom_keys[key] = mult
        # a recipe lr_mult key that matches ZERO param paths is a silent
        # wrong-LR run (typo, or a reference nesting this translation table
        # doesn't cover — e.g. the decoder under `backbone`); fail loudly.
        # Constructor-generated keys are exempt: they enumerate layer ids
        # programmatically and unmatched ids are structural, not typos.
        paths = []
        jax.tree_util.tree_map_with_path(
            lambda kp, _: paths.append(_keypath_str(kp)), params
        )
        unmatched = [
            k for k in custom_keys
            if k not in implicit
            and not any(p.startswith(k) or ("/" + k) in p for p in paths)
        ]
        if unmatched:
            raise ValueError(
                f"paramwise_cfg.custom_keys entries match no param path: "
                f"{unmatched} — typo, or a reference module nesting the "
                "dotted-key translation doesn't cover (train/optim.py)"
            )
    clip = clip_norm = None
    if optim_cfg.get("clip_grad"):
        cg = optim_cfg["clip_grad"]
        # reference form: {type: value, clip_value: X} (config/cod.yml:108-110,
        # commented there); MMEngine's default form is {max_norm: X}
        # (torch clip_grad_norm_). Anything else must fail loudly — silently
        # training unclipped is invisible until divergence.
        if cg.get("clip_value") is not None:
            clip = float(cg["clip_value"])
        elif cg.get("max_norm") is not None:
            clip_norm = float(cg["max_norm"])
        else:
            raise ValueError(
                f"clip_grad must set clip_value or max_norm, got: {cg}"
            )
    return build_optimizer(
        params,
        base_lr=float(opt.get("lr", 5e-4)),
        weight_decay=float(opt.get("weight_decay", 0.1)),
        max_epochs=max_epochs,
        steps_per_epoch=steps_per_epoch,
        custom_keys=custom_keys,
        grad_clip=clip,
        grad_clip_norm=clip_norm,
        frozen_prefixes=frozen_prefixes,
        bf16_state=bool(optim_cfg.get("bf16_state", False)),
    )
