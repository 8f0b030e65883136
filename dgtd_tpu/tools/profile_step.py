"""Profile the train/predict step on the current backend and print the top
device ops by self time.

Runs a few steps under ``jax.profiler.trace`` and aggregates the emitted
chrome-trace (``*.trace.json.gz``) device track by op category, which is
enough to rank convert/fusion/conv/copy time without TensorBoard.

Usage:
  python -m dgtd_tpu.tools.profile_step --mode train --size 384 --batch 32
  python -m dgtd_tpu.tools.profile_step --parse /path/to/profile_dir  # re-parse
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def parse_trace(log_dir: str, top: int = 25) -> None:
    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        print("no trace.json.gz under", log_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # leaf op rows live on threads named "XLA Ops" of the device process
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "tpu" in n or "XLA" in n}
    if not device_pids:
        device_pids = set(pid_names)
    op_tracks = {
        k for k, n in tid_names.items() if k[0] in device_pids and "XLA Ops" in n
    }

    by_op = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if op_tracks:
            if key not in op_tracks:
                continue
        elif e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "")
        # strip uniquing suffixes: fusion.123 -> fusion
        op = re.sub(r"[.\d]+$", "", name) or name
        by_op[name] += dur
        by_cat[op] += dur
        total += dur
    print(f"\ntrace: {paths[-1]}\ntotal device-track time: {total/1e3:.1f} ms")
    print("\n-- by op category --")
    for k, v in by_cat.most_common(top):
        print(f"  {v/1e3:9.2f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")
    print("\n-- top individual ops --")
    for k, v in by_op.most_common(top):
        print(f"  {v/1e3:9.2f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "infer"], default="train")
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/dgtd_profile")
    ap.add_argument("--parse", help="only parse an existing profile dir")
    args = ap.parse_args(argv)

    if args.parse:
        parse_trace(args.parse)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        if jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dgtd")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from dgtd_tpu.models import cod

    model = cod(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), (1, args.size, args.size, 3))
    rng = np.random.RandomState(0)

    if args.mode == "train":
        from dgtd_tpu.train.optim import build_optimizer
        from dgtd_tpu.train.state import TrainState, make_train_step

        tx = build_optimizer(variables["params"], steps_per_epoch=100)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        step_fn = make_train_step(model, tx)
        batch = {
            "input": jnp.asarray(rng.rand(args.batch, args.size, args.size, 3), jnp.float32),
            "depth": jnp.asarray(rng.rand(args.batch, args.size, args.size, 1), jnp.float32),
            "label": jnp.asarray(rng.rand(args.batch, args.size, args.size, 1) > 0.5, jnp.float32),
        }
        key = jax.random.PRNGKey(1)
        state, aux = step_fn(state, batch, key)  # compile outside the trace
        float(aux["loss"])
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                state, aux = step_fn(state, {**batch, "input": batch["input"] + i * 1e-6}, key)
                float(aux["loss"])
    else:
        fn = jax.jit(lambda v, im, d: model.predict(v, im, d)[0])
        im = jnp.asarray(rng.rand(args.batch, args.size, args.size, 3), jnp.float32)
        d = jnp.asarray(rng.rand(args.batch, args.size, args.size, 1), jnp.float32)
        float(jnp.sum(fn(variables, im, d)))
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                float(jnp.sum(fn(variables, im + i * 1e-6, d)))

    parse_trace(args.out)


if __name__ == "__main__":
    main()
