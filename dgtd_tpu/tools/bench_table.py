"""One-command benchmark table: every dataset, one checkpoint, one process.

The reference's benchmark story is one ``test.sh`` run per dataset
(/root/reference/script/test.sh:1) — model rebuilt and checkpoint reloaded
N times. This collator loads the model + checkpoint ONCE and walks every
provided dataset through the val loop (per-resolution jit buckets reuse the
compile cache across datasets of the same size), then prints the full
E/F/S/MAE markdown table plus one JSON line:

    python -m dgtd_tpu.tools.bench_table --config configs/cod.yml \
        --checkpoint /path/ckpt.npz \
        --dataset COD10K_TEST:/data/COD10K \
        --dataset COD_TEST:/data/CAMO \
        --dataset CHAMELEON:/data/CHAMELEON \
        --dataset NC4K:/data/NC4K \
        [--depth-dir Depth_popnet] [--batch-size 1] [--out table.md]

Dataset specs are ``TYPE:data_dir[:depth_dir]``; the registered dataset
class supplies its reference resolution (COD10K_TEST 384², COD_TEST/
CHAMELEON/NC4K 704² — datasets.py). docs/BENCHMARK.md documents the
per-dataset single commands this composes.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional


def _parse_spec(spec: str, default_depth: str):
    parts = spec.split(":")
    if len(parts) == 2:
        return parts[0], parts[1], default_depth
    if len(parts) == 3:
        return parts[0], parts[1], parts[2]
    raise SystemExit(f"--dataset expects TYPE:data_dir[:depth_dir], got {spec!r}")


def run_table(
    config: str,
    checkpoint: Optional[str],
    dataset_specs: List[str],
    depth_dir: str = "Depth_popnet",
    batch_size: int = 1,
    overrides: Optional[List[str]] = None,
    dtype=None,
    image_size: Optional[int] = None,
) -> dict:
    import jax.numpy as jnp

    from ..core.config import load_config
    from ..train.loop import Runner

    cfg = load_config(config, overrides or [])
    # the val loop builds its loaders per dataset below; silence the recipe's
    # default val block so Runner init doesn't require its data_dir to exist
    cfg["val_dataloader"] = None
    runner = Runner(
        cfg,
        work_dir=cfg.get("work_dir", "./output/bench_table"),
        mode="val",
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )
    if checkpoint:
        runner.restore_checkpoint(checkpoint)

    rows = {}
    for spec in dataset_specs:
        ds_type, data_dir, ds_depth = _parse_spec(spec, depth_dir)
        ds_cfg = {
            "type": ds_type,
            "data_dir": data_dir,
            "depth_dir": ds_depth,
            "split": "val",
        }
        if image_size is not None:  # CPU-shrunk smokes; None = reference res
            ds_cfg["image_size"] = image_size
        loader_cfg = {
            "batch_size": batch_size,
            "dataset": ds_cfg,
            "sampler": {"shuffle": False},
        }
        runner.val_loader = runner._build_loader(loader_cfg, train=False)
        rows[f"{ds_type}:{data_dir}"] = runner.val()
    return rows


def format_markdown(rows: dict) -> str:
    metric_keys: List[str] = []
    for res in rows.values():
        for k in res:
            if k.startswith("COD/") and not k.endswith("_strict") and k not in metric_keys:
                metric_keys.append(k)
    lines = ["| dataset | " + " | ".join(k.split("/", 1)[1] for k in metric_keys) + " |"]
    lines.append("|" + "---|" * (len(metric_keys) + 1))
    for name, res in rows.items():
        vals = " | ".join(f"{res.get(k, float('nan')):.4f}" for k in metric_keys)
        lines.append(f"| {name} | {vals} |")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/cod.yml")
    ap.add_argument("--checkpoint", default=None,
                    help="orbax dir or .npz (convert a reference .pth first: "
                         "python -m dgtd_tpu.tools.convert_ckpt full ...)")
    ap.add_argument("--dataset", action="append", required=True,
                    help="TYPE:data_dir[:depth_dir]; repeatable")
    ap.add_argument("--depth-dir", default="Depth_popnet")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="reference ValLoop parity is 1 (config/cod.yml:28)")
    ap.add_argument("-o", "--override", action="append", default=[],
                    help="dotted config overrides (e.g. model.variant=tiny)")
    ap.add_argument("--image-size", type=int, default=None,
                    help="override every dataset's resolution (default: each "
                         "dataset's reference resolution)")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--out", default=None, help="also write the markdown table here")
    args = ap.parse_args(argv)

    from .serving_check import _enable_tpu_compile_cache

    _enable_tpu_compile_cache()
    import jax.numpy as jnp

    rows = run_table(
        args.config,
        args.checkpoint,
        args.dataset,
        depth_dir=args.depth_dir,
        batch_size=args.batch_size,
        overrides=args.override,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        image_size=args.image_size,
    )
    table = format_markdown(rows)
    print(table)
    print(json.dumps({"benchmark_table": rows}))
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
    return rows


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
