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

def _enable_tpu_compile_cache():
    # Called from main(), not at import: backend init blocks forever on a
    # dead axon tunnel and would hang even --help.
    from ..utils.tpu_probe import enable_tpu_compile_cache

    enable_tpu_compile_cache()


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


def _timed_scan_idx(fn, iters, captures, repeats=3):
    """Like ``_timed_scan`` but per-iteration variation is the scanned index
    (offset by a per-repeat seed) instead of ``iters`` stacked input copies —
    required when one input copy is GB-scale (1024² affinity fields).
    ``fn(i, *captures)`` with scalar ``i``; returns best sec/iter."""

    @jax.jit
    def run(seed, captures):
        def body(carry, i):
            return carry + jnp.sum(fn(i + seed, *captures)), None

        total, _ = lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.float32)
        )
        return total

    float(run(jnp.float32(-7.0), captures))  # compile
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        float(run(jnp.float32(r * iters), captures))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


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
        ),
        # under the revalidation sweep stdout is a captured pipe (block-
        # buffered): each completed check must hit the pipe immediately or a
        # later teardown hang + timeout kill discards it from the sweep
        flush=True,
    )


def check_diffusion(grid: int, c: int = 24, kernel: int = 7, steps: int = 4, iters: int = 4):
    """The affinity field is (H,W,C,k²) — 2.35 GB bf16 at a 1024² grid — so
    everything is sized for ONE resident copy per layout: inputs are generated
    on device (no host transfer of GB-scale tensors through the tunnel) and
    per-iteration variation comes from the scanned index + per-repeat seed
    (stacking ``iters`` distinct copies, the small-grid harness design, OOMs
    HBM at 1024²)."""
    from dgtd_tpu.models.diffusion import message_passing_step, normalize_affinity
    from dgtd_tpu.ops.diffusion_pallas import (
        diffusion_pallas_v2,
        diffusion_pallas_v2_planes,
    )

    dtype = jnp.bfloat16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x_nhwc = jax.jit(
        lambda k: jax.random.uniform(k, (1, grid, grid, c), dtype)
    )(k1)
    # generated + normalized directly in bf16 (halves peak HBM vs an fp32
    # staging copy): uniform taps keep the random-walk sums in [k²/2 ± k²/4],
    # far from bf16 precision trouble, and the bench only times the stencil
    w_nhwc = jax.jit(
        lambda k: normalize_affinity(
            jax.random.uniform(k, (1, grid, grid, c, kernel * kernel), dtype)
        ).astype(dtype)
    )(k2)

    results = {"check": f"diffusion_{grid}sq_c{c}_k{kernel}_s{steps}"}

    def leg(name, fn, args):
        """Each backend measured independently: at serving grids the fused
        XLA path can exceed HBM (its patch unfold is another k²-sized field)
        — that is a RESULT, not a harness failure."""
        try:
            results[name] = round(_timed_scan_idx(fn, iters, args) * 1e3, 3)
        except Exception as e:
            msg = str(e)
            results[name] = (
                "OOM: " + msg[msg.find("Ran out of memory") :][:90]
                if "Ran out of memory" in msg
                else f"error: {type(e).__name__}: {msg[:120]}"
            )

    def run_xla(i, x, w):
        # cast the perturbation: a strong-f32 seed would silently promote the
        # whole bf16 activation stream to f32 (2x HBM traffic in the bench)
        y = x + (i * 1e-6).astype(x.dtype)
        for _ in range(steps):
            y = message_passing_step(y, w, kernel)
        return y

    leg("fused_xla_ms", run_xla, [x_nhwc, w_nhwc])

    def run_nhwc_wrapper(i, x, w):
        return diffusion_pallas_v2(x + (i * 1e-6).astype(x.dtype), w, kernel, steps)

    leg("pallas_nhwc_wrapper_ms", run_nhwc_wrapper, [x_nhwc, w_nhwc])

    # plane layouts replace the NHWC copies (one resident k²-field at a time)
    x_planes = jax.jit(lambda x: x[0].transpose(2, 0, 1))(x_nhwc)
    w_planes = jax.jit(
        lambda w: w[0].transpose(2, 3, 0, 1).reshape(c, kernel * kernel, grid, grid)
    )(w_nhwc)
    del w_nhwc

    def run_planes(i, x, w):
        return diffusion_pallas_v2_planes(x + (i * 1e-6).astype(x.dtype), w, kernel, steps)

    leg("pallas_planes_ms", run_planes, [x_planes, w_planes])

    for num, ratio in (
        ("fused_xla_ms", "planes_vs_xla"),
        ("pallas_nhwc_wrapper_ms", "planes_vs_nhwc_wrapper"),
    ):
        if isinstance(results[num], float) and isinstance(results["pallas_planes_ms"], float):
            results[ratio] = round(results[num] / results["pallas_planes_ms"], 2)
    print(json.dumps(results), flush=True)  # captured-pipe buffering: see check_predict


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[704, 1024])
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--skip-predict", action="store_true")
    ap.add_argument("--skip-diffusion", action="store_true")
    args = ap.parse_args(argv)
    _enable_tpu_compile_cache()
    if not args.skip_diffusion:
        check_diffusion(args.grid)
    if not args.skip_predict:
        for s in args.sizes:
            check_predict(s)


if __name__ == "__main__":
    main()
