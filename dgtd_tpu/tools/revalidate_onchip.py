"""One-command on-chip revalidation sweep (round-4 verdict #2).

The axon tunnel outage left rounds 3-5 without fresh on-chip numbers while
the code kept moving (MSDA dtype cast, per-metric val gating, resize/layers
changes, bench roofline fields). This tool re-validates EVERYTHING that
changed since the last good measurements in one command, strictly
sequentially (the tunnel serves one process at a time):

  1. ``python bench.py``                 — headline 384² infer + bs32 train
                                           + 512² + composed eval + roofline
  2. ``serving_check --sizes 704 1024``  — high-res serving + stencil kernel
  3. MSDA micro-bench (child mode)       — Pallas vs XLA-gather reference at
                                           detection scale (the r4 cast
                                           touched the kernel's output path)
  4. export → ``ServingModel.load`` → one timed run (bundle-serving seam)

Every step's JSON lines are parsed, compared against the PINNED round-2
on-chip figures, and drift >5% is flagged. Writes ``REVALIDATION.json`` at
the repo root and prints a human summary. Report-only: drift flags never
change the exit code (the artifact is for reading, not gating).

The sweep is PROBE-GATED: a dead axon tunnel would otherwise burn hours of
child timeouts (each step's child blocks in backend init until killed). A
bounded probe (utils/tpu_probe.py) runs first; if the tunnel is down the
sweep writes a diagnostic artifact and exits fast — or, with
``--wait-for-tunnel``, re-probes every ``--wait-retry`` seconds (default
300) up to ``--wait-max`` seconds (default 9 h) and launches the sweep the
moment the tunnel recovers, so it can be left running in the background
across an outage.

ONE-TPU-PROCESS RULE: the axon tunnel serves strictly one process at a
time, and the sweep takes it for its full duration (~45-90 min). Do not
run a second sweep, ``bench.py``, or any other TPU process concurrently —
the loser's probes time out and a HEALTHY tunnel gets reported as
``tpu_unreachable``. In wait mode, size ``--wait-max`` so a sweep that
triggers at the last moment still finishes before any scheduled bench run
(e.g. a CI driver window) begins.

Usage:
  python -m dgtd_tpu.tools.revalidate_onchip            # full sweep
  python -m dgtd_tpu.tools.revalidate_onchip --wait-for-tunnel   # outage mode
  python -m dgtd_tpu.tools.revalidate_onchip --msda-child    # (internal)
  python -m dgtd_tpu.tools.revalidate_onchip --export-child  # (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Last good driver-captured / builder-refreshed on-chip figures (round 2,
#: v5e, bf16 — STATUS.md r2/r3 tables). Drift is measured against these.
PINS = {
    "infer_384_bs8_img_s": 231.4,
    "train_bs32_img_s": 78.4,
    "infer_512_img_s": 121.9,
    "serving_704_ms_per_image": 26.5,
    "serving_1024_ms_per_image": 60.7,
    "msda_pallas_fwd_ms": 9.8,
    "msda_reference_fwd_ms": 62.5,
}

DRIFT_PCT = 5.0


# ---------------------------------------------------------------------------
# child: MSDA micro-bench (own process — backend init isolated per step)
# ---------------------------------------------------------------------------


def _msda_child(tiny: bool = False) -> None:
    """Detection-scale micro-bench of the Pallas MSDA kernel vs the
    XLA-gather reference: N2 M8 D32 P4, levels 64²/32²/16²/8² (Lq = S =
    5440) — the exact configuration the 6.4x figure in ops/msda.py was
    measured at. Tunnel-safe methodology: a jitted scan over distinct
    sampling locations with a scalar readback. ``tiny`` is the CI smoke:
    micro shapes + interpret-mode Pallas off-TPU, timing numbers meaningless
    but the whole measurement path executes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ..ops.msda import make_ms_deform_attn
    from ..utils.tpu_probe import enable_tpu_compile_cache

    enable_tpu_compile_cache()
    interpret = jax.default_backend() != "tpu"
    if tiny:
        shapes = ((8, 8), (4, 4))
        n, m, d, p, lq = 1, 2, 8, 2, 80
    else:
        shapes = ((64, 64), (32, 32), (16, 16), (8, 8))
        n, m, d, p, lq = 2, 8, 32, 4, 5440
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.rand(n, s, m, d), jnp.float32)
    k_iters = 4
    locs = jnp.asarray(rng.rand(k_iters, n, lq, m, len(shapes), p, 2), jnp.float32)
    wts = jnp.asarray(rng.rand(k_iters, n, lq, m, len(shapes), p), jnp.float32)
    wts = wts / jnp.sum(wts, axis=(-2, -1), keepdims=True)

    results = {
        "metric": "msda_detection_scale_n2m8d32p4" if not tiny else "msda_tiny_smoke",
        "unit": "ms/call",
    }
    for name, use_pallas in (("pallas", True), ("reference", False)):
        op = make_ms_deform_attn(shapes, use_pallas=use_pallas, interpret=interpret)

        @jax.jit
        def fwd_scan(value, locs, wts, seed):
            def body(carry, xs):
                sl, aw = xs
                return carry + jnp.sum(op(value, sl + seed * 1e-6, aw)), None

            total, _ = lax.scan(body, jnp.float32(0.0), (locs, wts))
            return total

        @jax.jit
        def bwd_scan(value, locs, wts, seed):
            def body(carry, xs):
                sl, aw = xs
                g = jax.grad(
                    lambda v, s_, a: jnp.sum(op(v, s_, a)), argnums=(0, 1, 2)
                )(value, sl + seed * 1e-6, aw)
                return carry + sum(jnp.sum(x) for x in g), None

            total, _ = lax.scan(body, jnp.float32(0.0), (locs, wts))
            return total

        for kind, fn in (("fwd", fwd_scan), ("bwd", bwd_scan)):
            float(fn(value, locs, wts, jnp.float32(-1.0)))  # compile
            times = []
            for r in range(3):
                t0 = time.perf_counter()
                float(fn(value, locs, wts, jnp.float32(r)))
                times.append(time.perf_counter() - t0)
            results[f"{name}_{kind}_ms"] = round(min(times) / k_iters * 1000, 2)
    results["fwd_speedup"] = round(
        results["reference_fwd_ms"] / results["pallas_fwd_ms"], 2
    )
    results["bwd_speedup"] = round(
        results["reference_bwd_ms"] / results["pallas_bwd_ms"], 2
    )
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results), flush=True)


# ---------------------------------------------------------------------------
# child: export → load → serve one input
# ---------------------------------------------------------------------------


def _export_child(tiny: bool = False) -> None:
    """Round-trip the AOT serving seam on the chip: export a 384² bundle
    from random init, ServingModel.load it (no Flax, no registry), run one
    timed batch. Proves the StableHLO bundle path the r3 layers/resize
    changes flow through. ``tiny`` is the CI smoke (48² tiny tower, fp32)."""
    import shutil
    import tempfile

    import numpy as np

    from .export_serving import ServingModel, main as export_main

    size = 48 if tiny else 384
    out = tempfile.mkdtemp(prefix="dgtd_reval_export_")
    try:
        argv = ["--sizes", str(size), "--out", out]
        if tiny:
            import yaml

            cfg = {"model": {
                "type": "cod", "variant": "tiny", "channel": 8,
                "latent_dim": 8, "grid": 8, "diffusion_steps": 1,
                "refine_iters": 1, "convnext_dims": [8, 16, 32, 64],
                "convnext_depths": [1, 1, 1, 1],
            }}
            cfg_path = os.path.join(out, "_tiny_export.yml")
            with open(cfg_path, "w") as f:
                yaml.safe_dump(cfg, f)
            argv += ["--config", cfg_path, "--fp32"]
        else:
            argv = ["--model", "cod"] + argv
        export_main(argv)
        t0 = time.perf_counter()
        served = ServingModel.load(out)
        load_s = time.perf_counter() - t0
        rng = np.random.RandomState(0)
        im = rng.rand(1, size, size, 3).astype(np.float32)
        dep = rng.rand(1, size, size, 1).astype(np.float32)
        np.asarray(served(im, dep))  # compile+run
        t0 = time.perf_counter()
        prob = np.asarray(served(im + 1e-6, dep))
        run_ms = (time.perf_counter() - t0) * 1000
        print(
            json.dumps(
                {
                    "metric": f"serving_bundle_roundtrip_{size}",
                    "load_s": round(load_s, 2),
                    "run_ms": round(run_ms, 2),
                    "finite": bool(np.isfinite(prob).all()),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def _parse_json_lines(stdout) -> list:
    if isinstance(stdout, bytes):
        stdout = stdout.decode(errors="replace")
    lines = []
    for line in (stdout or "").splitlines():
        try:
            rec = json.loads(line)
            if isinstance(rec, dict):
                lines.append(rec)
        except ValueError:
            continue
    return lines


def _run_step(name: str, cmd: list, timeout_s: float) -> dict:
    """Run one sweep step; return {'lines': [parsed JSON records], ...}.
    Failures are recorded, never raised — a partial sweep still writes a
    useful artifact. A step killed at its timeout keeps whatever JSON lines
    it already printed (a tunnel that dies in a child's TEARDOWN, after the
    measurements landed, must not discard them — the children flush each
    record for exactly this path)."""
    print(f"[revalidate] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s, cwd=REPO
        )
    except subprocess.TimeoutExpired as e:
        out = {
            "name": name,
            "error": f"timeout_{int(timeout_s)}s",
            "lines": _parse_json_lines(e.stdout),
            "wall_s": round(time.time() - t0, 1),
        }
        for rec in out["lines"]:
            print(f"[revalidate] {name} (pre-timeout) -> {json.dumps(rec)}", flush=True)
        return out
    lines = _parse_json_lines(r.stdout)
    out = {"name": name, "rc": r.returncode, "lines": lines, "wall_s": round(time.time() - t0, 1)}
    if r.returncode != 0:
        out["stderr_tail"] = (r.stderr or "")[-500:]
    # stream the raw lines through so the sweep log is self-contained
    for rec in lines:
        print(f"[revalidate] {name} -> {json.dumps(rec)}", flush=True)
    return out


def _drift(measured, pin):
    if measured is None or not pin:
        return None
    return round(100.0 * (float(measured) - pin) / pin, 1)


def collate(steps: list) -> tuple:
    """Pull the pinned metrics out of the sweep steps' JSON records.
    Returns (measured, drift_flags). A matched record with a MISSING field
    (e.g. a check that errored and emitted a partial line) must not write a
    null into ``measured`` — null reads as 'measured, value null' and makes
    key-set comparisons against PINS count it as covered."""
    measured = {}

    def put(key, value):
        if value is not None:
            measured[key] = value

    for step in steps:
        for rec in step.get("lines", []):
            m = rec.get("metric", "") or rec.get("check", "")
            if m.startswith("cod_bf16_384sq_bs8_infer") and rec.get("value"):
                put("infer_384_bs8_img_s", rec["value"])
                put("train_bs32_img_s", rec.get("train_images_per_sec_bs32"))
                put("infer_512_img_s", rec.get("infer_512_images_per_sec"))
            elif m == "predict_704sq_bs1":
                put("serving_704_ms_per_image", rec.get("ms_per_image"))
            elif m == "predict_1024sq_bs1":
                put("serving_1024_ms_per_image", rec.get("ms_per_image"))
            elif m.startswith("msda_detection_scale"):
                put("msda_pallas_fwd_ms", rec.get("pallas_fwd_ms"))
                put("msda_reference_fwd_ms", rec.get("reference_fwd_ms"))
    drift_flags = {}
    for key, pin in PINS.items():
        d = _drift(measured.get(key), pin)
        if d is not None and abs(d) > DRIFT_PCT:
            drift_flags[key] = {"pin": pin, "measured": measured[key], "drift_pct": d}
    return measured, drift_flags


def _gate_on_tunnel(args) -> tuple:
    """Bounded TPU-liveness gate before the sweep spawns any backend-touching
    child (a dead tunnel blocks each child in backend init until its step
    timeout — hours of burned window). Returns (ok, gate_record). With
    ``--wait-for-tunnel``, re-probes every ``--wait-retry`` seconds until
    ``--wait-max`` is exhausted, so the sweep self-triggers on recovery."""
    from ..utils.tpu_probe import probe_tpu_retrying

    # The hang hazard lives in the CHILD steps, which inherit only the
    # ENVIRONMENT — an in-process jax.config CPU forcing in THIS process
    # (backend_is_forced_cpu's other arm) would not protect them, so the
    # gate may only be skipped when the axon plugin can't register in the
    # children either: a falsy pool var (CI smoke / non-axon hosts).
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True, {"skipped": "axon_unconfigured"}

    def _announce(record, sleep_s):
        print(
            f"[revalidate] tunnel down (attempt {record['probe_attempts']}: "
            f"{record['error']}); next probe in {sleep_s:.0f}s",
            flush=True,
        )

    return probe_tpu_retrying(
        args.wait_retry,
        lambda elapsed, sleep_s: args.wait_for_tunnel
        and elapsed + sleep_s <= args.wait_max,
        on_wait=_announce,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--msda-child", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="CI smoke shapes for --msda-child")
    ap.add_argument("--export-child", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-serving", action="store_true")
    ap.add_argument("--skip-msda", action="store_true")
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument("--wait-for-tunnel", action="store_true",
                    help="re-probe across an outage and run on recovery")
    ap.add_argument("--wait-retry", type=float, default=300.0,
                    help="seconds between probe attempt starts in wait mode")
    ap.add_argument("--wait-max", type=float, default=32400.0,
                    help="give up waiting after this many seconds (default 9 h)")
    ap.add_argument("--out", default=os.path.join(REPO, "REVALIDATION.json"))
    args = ap.parse_args(argv)
    if args.msda_child:
        _msda_child(tiny=args.tiny)
        return
    if args.export_child:
        _export_child(tiny=args.tiny)
        return

    ok, gate = _gate_on_tunnel(args)
    if not ok:
        artifact = {
            "error": gate.get("error", "tpu_unreachable"),
            "gate": gate,
            "pins": PINS,
            "measured": {},
            "drift_flags": {},
            "steps": [],
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"[revalidate] wrote {args.out} (tunnel never came up)", flush=True)
        print(
            json.dumps(
                {
                    "metric": "revalidation_sweep",
                    "error": artifact["error"],
                    "gate": gate,
                }
            ),
            flush=True,
        )
        return

    py = sys.executable
    steps = []
    if not args.skip_bench:
        # bench.py runs its own probe-retry watchdog inside
        # DGTD_BENCH_DEADLINE (inherited by the child): the step timeout
        # must sit ABOVE that deadline or a mid-sweep tunnel death gets the
        # bench killed while legitimately waiting, losing even its
        # diagnostic line
        bench_deadline = float(os.environ.get("DGTD_BENCH_DEADLINE", "2700"))
        steps.append(
            ("bench", [py, os.path.join(REPO, "bench.py")], bench_deadline + 900)
        )
    if not args.skip_serving:
        steps.append(
            ("serving", [py, "-m", "dgtd_tpu.tools.serving_check", "--sizes", "704", "1024"], 2400)
        )
    if not args.skip_msda:
        steps.append(
            ("msda", [py, "-m", "dgtd_tpu.tools.revalidate_onchip", "--msda-child"], 1800)
        )
    if not args.skip_export:
        steps.append(
            ("export", [py, "-m", "dgtd_tpu.tools.revalidate_onchip", "--export-child"], 1800)
        )

    results = [_run_step(name, cmd, t) for name, cmd, t in steps]
    measured, drift_flags = collate(results)

    artifact = {
        "gate": gate,
        "pins": PINS,
        "measured": measured,
        "drift_flags": drift_flags,
        "steps": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"[revalidate] wrote {args.out}", flush=True)
    print(
        json.dumps(
            {
                "metric": "revalidation_sweep",
                "measured": measured,
                "drift_flags": drift_flags or None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
