"""AOT serving export: serialize the jitted predict path to a portable bundle.

The reference deploys by re-running its Python stack (`script/test.sh` →
torchrun + nest + MMEngine, script/test.sh:1); the TPU-idiomatic serving
story is ahead-of-time export — ``jax.export`` lowers ``predict`` to
versioned StableHLO once, and the artifact then runs under any matching JAX
runtime (TPU server, CPU canary) without the model code, the config system,
or a trace step. One bundle holds one exported program per resolution bucket
(384² recipe / 704² benchmark sizes — static shapes per XLA semantics) plus
the weights and metadata:

    bundle/
      meta.json            model name/kwargs, sizes, platforms, version
      params.npz           flat float32 weight tree (collection/path keys)
      predict_<S>.hlo      serialized jax.export artifact per bucket size

``ServingModel.load`` rebuilds the tree from the npz alone — no model
construction, registry, or Flax at load time; inputs at non-bucket sizes are
bilinearly resized to the nearest bucket and the probability map is resized
back (the reference's own eval protocol resizes predictions to label size,
cod.py:153).

Usage:
  python -m dgtd_tpu.tools.export_serving --config configs/cod.yml \
      --ckpt epoch_100.npz --sizes 384 704 --platforms tpu cpu --out bundle/
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def _flatten_tree(tree) -> Dict[str, np.ndarray]:
    """Shared npz flat-key format (train/hooks.py), leaves cast to the fp32
    serving contract."""
    from ..train.hooks import flatten_tree

    return {k: np.asarray(v, np.float32) for k, v in flatten_tree(tree).items()}


def _unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key in sorted(flat):
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def export_bundle(
    model,
    variables,
    out_dir: str,
    sizes: Sequence[int] = (384,),
    platforms: Optional[Sequence[str]] = None,
    meta_extra: Optional[dict] = None,
) -> dict:
    """Write a serving bundle for ``model`` (a registered _SegModel instance).

    ``platforms=None`` exports for the current default backend only; pass
    e.g. ``('tpu', 'cpu')`` for a multi-platform artifact.
    """
    from jax import export as jax_export

    os.makedirs(out_dir, exist_ok=True)
    variables = jax.device_get(variables)

    def predict(vars_tree, image, depth):
        prob, _ = model.predict(vars_tree, image, depth)
        return prob

    var_struct = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.float32), variables
    )
    sizes = sorted(int(s) for s in sizes)
    artifacts = {}
    for s in sizes:
        image = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
        depth = jax.ShapeDtypeStruct((1, s, s, 1), jnp.float32)
        exp = jax_export.export(
            jax.jit(predict), platforms=list(platforms) if platforms else None
        )(var_struct, image, depth)
        name = f"predict_{s}.hlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(bytes(exp.serialize()))
        artifacts[str(s)] = name

    np.savez(os.path.join(out_dir, "params.npz"), **_flatten_tree(variables))
    meta = {
        "format_version": FORMAT_VERSION,
        "sizes": sizes,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "artifacts": artifacts,
        **(meta_extra or {}),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class ServingModel:
    """Run an exported bundle: ``ServingModel.load(dir)(image, depth)``.

    Needs only jax + numpy at load time (the model zoo is not imported).
    """

    def __init__(self, meta: dict, variables, programs: Dict[int, Any]):
        self.meta = meta
        self.variables = variables
        self.programs = programs
        self.sizes = sorted(programs)

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        from jax import export as jax_export

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(f"bundle format {meta['format_version']} is newer than this loader")
        with np.load(os.path.join(path, "params.npz")) as z:
            variables = _unflatten_tree({k: z[k] for k in z.files})
        programs = {}
        for s, name in meta["artifacts"].items():
            with open(os.path.join(path, name), "rb") as f:
                programs[int(s)] = jax_export.deserialize(f.read())
        return cls(meta, variables, programs)

    def _bucket(self, h: int, w: int) -> int:
        side = max(h, w)
        for s in self.sizes:
            if s >= side:
                return s
        return self.sizes[-1]

    def __call__(self, image: np.ndarray, depth: np.ndarray) -> np.ndarray:
        """image (1,H,W,3), depth (1,H,W,1) float32 -> prob (1,H,W,1)."""
        h, w = image.shape[1:3]
        s = self._bucket(h, w)
        if (h, w) != (s, s):
            image = _resize_nhwc(image, s)
            depth = _resize_nhwc(depth, s)
        prob = self.programs[s].call(self.variables, jnp.asarray(image), jnp.asarray(depth))
        prob = np.asarray(prob)
        if (h, w) != (s, s):
            prob = _resize_nhwc(prob, (h, w))
        return prob


def _resize_nhwc(x, size):
    """Host-side bilinear resize (align_corners=False, matching the model's
    utils.image.resize_bilinear semantics) via jax.image on default backend."""
    if isinstance(size, int):
        size = (size, size)
    return np.asarray(
        jax.image.resize(
            jnp.asarray(x), (x.shape[0], size[0], size[1], x.shape[3]), "bilinear"
        )
    )


def _load_checkpoint_variables(variables, ckpt_path: str):
    """Strict full-tree graft (params + BN batch_stats): see
    ``train.hooks.load_variables_checkpoint``."""
    from ..train.hooks import load_variables_checkpoint

    new_vars, loaded, _ = load_variables_checkpoint(variables, ckpt_path, strict=True)
    return new_vars, len(loaded)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", help="recipe YAML; its model: block selects the network")
    ap.add_argument("--model", default=None, help="registered model name (overrides config)")
    ap.add_argument("--ckpt", default=None, help="checkpoint (.npz flat tree or orbax dir)")
    ap.add_argument("--sizes", type=int, nargs="+", default=[384])
    ap.add_argument(
        "--platforms", nargs="*", default=None, help="e.g. tpu cpu (default: current backend)"
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--fp32", action="store_true", help="export fp32 compute (default bf16)")
    args = ap.parse_args(argv)

    from ..core.registry import MODELS

    model_cfg: Dict[str, Any] = {"type": "cod"}
    if args.config:
        from ..core.config import load_config

        cfg = load_config(args.config, [])
        model_cfg = dict(cfg.get("model") or model_cfg)
    if args.model:
        model_cfg["type"] = args.model
    model_cfg["dtype"] = jnp.float32 if args.fp32 else jnp.bfloat16
    model = MODELS.build(model_cfg)

    variables = model.init(jax.random.PRNGKey(0), (1, args.sizes[0], args.sizes[0], 3))
    loaded = 0
    if args.ckpt:
        variables, loaded = _load_checkpoint_variables(variables, args.ckpt)

    meta = export_bundle(
        model,
        variables,
        args.out,
        sizes=args.sizes,
        platforms=args.platforms,
        meta_extra={"model": model_cfg["type"], "ckpt": args.ckpt, "loaded_params": loaded},
    )
    print(json.dumps({"exported": args.out, **meta}), flush=True)


if __name__ == "__main__":
    main()
