#!/usr/bin/env python
"""Train/val entry point.

Reference UX parity (script/train.sh:1):
    python train.py configs/cod.yml -o work_dir=./output/run -o seed=1 [-m val]
replaces
    torchrun ... nest task run config/cod.yml -o work_dir=... -o launcher=pytorch [-m val]

Distribution comes from the JAX mesh (all local devices by default), not a
process launcher; multi-host runs call jax.distributed.initialize via
``-o dist.coordinator=...``.
"""

import argparse

import jax
import jax.numpy as jnp


def _enable_tpu_compile_cache():
    """Called from main(), NOT at import — backend init blocks forever on a
    dead axon tunnel and would hang even ``--help`` (shared helper:
    dgtd_tpu/utils/tpu_probe.py)."""
    from dgtd_tpu.utils.tpu_probe import enable_tpu_compile_cache

    enable_tpu_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-o", "--override", action="append", default=[], help="dotted key=value")
    ap.add_argument("-m", "--mode", default="train", choices=["train", "val"])
    ap.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    ap.add_argument("--resume", default=None, help="checkpoint path to resume from")
    args = ap.parse_args()
    _enable_tpu_compile_cache()

    from dgtd_tpu.core.config import get_dotted, load_config
    from dgtd_tpu.parallel.mesh import initialize_multihost
    from dgtd_tpu.train.loop import Runner

    cfg = load_config(args.config, args.override)
    initialize_multihost(get_dotted(cfg, "dist.coordinator"))
    # -o dist.space=2 selects the 2-D data×space mesh (high-res extension,
    # SURVEY.md §2.9); default is the pure-DP topology (DDP parity).
    from dgtd_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(space=int(get_dotted(cfg, "dist.space", 1)))
    runner = Runner(
        cfg,
        work_dir=get_dotted(cfg, "work_dir", "./output/run"),
        seed=int(get_dotted(cfg, "seed", 0)),
        mesh=mesh,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        mode=args.mode,
    )
    if args.resume:
        runner.resume(args.resume)
    if args.mode == "train":
        runner.train()
    else:
        runner.val(save_visualizations=bool(get_dotted(cfg, "save_visualizations", False)))


if __name__ == "__main__":
    main()
