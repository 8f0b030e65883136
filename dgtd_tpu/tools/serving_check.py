"""Hardware validation of the high-res serving path (run on the real chip).

Three checks, each printing one JSON line:
  1. flagship ``cod`` predict at 704² bs1 — compile + timed run;
  2. flagship ``cod`` predict at 1024² bs1 — compile + timed run;
  3. diffusion stencil at a ≥512² grid (C=24, k=7, 4 steps): plane-layout
     Pallas (transpose-free) vs NHWC-wrapped Pallas vs fused XLA.

Timing follows the tunnel-safe protocol: distinct inputs per iteration via a
jitted lax.scan whose scalar reduction is read back (bench.py methodology).

Usage: python -m dgtd_tpu.tools.serving_check [--sizes 704 1024] [--grid 512]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dgtd")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def _timed_scan(fn, xs_list, repeats=3, captures=()):
    """fn(*xs_slice, seed, *captures) per scanned slice; returns best
    sec/iter. ``captures`` (e.g. model variables) are explicit jit args —
    closing over a 400 MB param tree bakes it into the compile request,
    which the remote-compile tunnel rejects (HTTP 413)."""

    @jax.jit
    def run(seed, captures, *stacked):
        def body(carry, xs):
            return carry + jnp.sum(fn(*xs, seed, *captures)), None

        total, _ = lax.scan(body, jnp.float32(0.0), stacked)
        return total

    n = xs_list[0].shape[0]
    float(run(jnp.float32(-1.0), captures, *xs_list))  # compile
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        float(run(jnp.float32(r), captures, *xs_list))
        times.append(time.perf_counter() - t0)
    return min(times) / n


def check_predict(size: int, iters: int = 4):
    from dgtd_tpu.models import cod

    model = cod(dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    variables = model.init(jax.random.PRNGKey(0), (1, size, size, 3))
    init_s = time.perf_counter() - t0
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(iters, 1, size, size, 3), jnp.float32)
    depths = jnp.asarray(rng.rand(iters, 1, size, size, 1), jnp.float32)

    t0 = time.perf_counter()
    sec = _timed_scan(
        lambda im, d, seed, v: model.predict(v, im + seed * 1e-6, d)[0],
        [images, depths],
        captures=(variables,),
    )
    total = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "check": f"predict_{size}sq_bs1",
                "ms_per_image": round(sec * 1000, 2),
                "images_per_sec": round(1.0 / sec, 2),
                "compile_plus_bench_s": round(total + init_s, 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


def check_diffusion(grid: int, c: int = 24, kernel: int = 7, steps: int = 4, iters: int = 4):
    from dgtd_tpu.models.diffusion import message_passing_step, normalize_affinity
    from dgtd_tpu.ops.diffusion_pallas import (
        diffusion_pallas_v2,
        diffusion_pallas_v2_planes,
    )

    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16
    x_nhwc = jnp.asarray(rng.rand(iters, 1, grid, grid, c), dtype)
    w_raw = jnp.asarray(rng.rand(iters, 1, grid, grid, c, kernel * kernel), jnp.float32)
    w_nhwc = normalize_affinity(w_raw).astype(dtype)
    x_planes = jnp.asarray(x_nhwc.transpose(0, 1, 4, 2, 3).reshape(iters, c, grid, grid))
    w_planes = jnp.asarray(
        w_nhwc.transpose(0, 1, 4, 5, 2, 3).reshape(iters, c, kernel * kernel, grid, grid)
    )

    results = {"check": f"diffusion_{grid}sq_c{c}_k{kernel}_s{steps}"}

    def run_planes(x, w, seed):
        # cast the perturbation: a strong-f32 seed would silently promote the
        # whole bf16 activation stream to f32 (2x HBM traffic in the bench)
        return diffusion_pallas_v2_planes(x + (seed * 1e-6).astype(x.dtype), w, kernel, steps)

    results["pallas_planes_ms"] = round(_timed_scan(run_planes, [x_planes, w_planes]) * 1e3, 3)

    def run_nhwc_wrapper(x, w, seed):
        return diffusion_pallas_v2(
            (x + (seed * 1e-6).astype(x.dtype))[None], w[None], kernel, steps
        )[0]

    results["pallas_nhwc_wrapper_ms"] = round(
        _timed_scan(run_nhwc_wrapper, [x_nhwc[:, 0], w_nhwc[:, 0]]) * 1e3, 3
    )

    def run_xla(x, w, seed):
        y = x + (seed * 1e-6).astype(x.dtype)
        for _ in range(steps):
            y = message_passing_step(y, w, kernel)
        return y

    results["fused_xla_ms"] = round(_timed_scan(run_xla, [x_nhwc, w_nhwc]) * 1e3, 3)

    results["planes_vs_xla"] = round(results["fused_xla_ms"] / results["pallas_planes_ms"], 2)
    results["planes_vs_nhwc_wrapper"] = round(
        results["pallas_nhwc_wrapper_ms"] / results["pallas_planes_ms"], 2
    )
    print(json.dumps(results))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[704, 1024])
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--skip-predict", action="store_true")
    ap.add_argument("--skip-diffusion", action="store_true")
    args = ap.parse_args(argv)
    if not args.skip_diffusion:
        check_diffusion(args.grid)
    if not args.skip_predict:
        for s in args.sizes:
            check_predict(s)


if __name__ == "__main__":
    main()
