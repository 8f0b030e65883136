"""The on-chip revalidation sweep tool (round-4 verdict #2 staging).

The real sweep needs the TPU; CI proves the harness: the MSDA micro-bench
child executes end to end on CPU (interpret-mode Pallas, tiny shapes), and
the collation/drift logic is pinned against synthetic sweep outputs.
"""

import json
import os
import subprocess
import sys

from dgtd_tpu.tools import revalidate_onchip as R

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_msda_child_tiny_runs_on_cpu():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "dgtd_tpu.tools.revalidate_onchip",
         "--msda-child", "--tiny"],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "msda_tiny_smoke"
    for k in ("pallas_fwd_ms", "reference_fwd_ms", "pallas_bwd_ms",
              "reference_bwd_ms", "fwd_speedup", "bwd_speedup"):
        assert isinstance(rec[k], (int, float)) and rec[k] > 0, (k, rec)


def test_export_child_tiny_roundtrips_on_cpu():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "dgtd_tpu.tools.revalidate_onchip",
         "--export-child", "--tiny"],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "serving_bundle_roundtrip_48"
    assert rec["finite"] is True
    assert rec["load_s"] < 30 and rec["run_ms"] > 0


def test_collate_extracts_pinned_metrics_and_flags_drift():
    bench_line = {
        "metric": "cod_bf16_384sq_bs8_infer_images_per_sec_per_chip",
        "value": 231.0,  # within 5% of the 231.4 pin
        "train_images_per_sec_bs32": 70.0,  # -10.7% vs 78.4 -> flagged
        "infer_512_images_per_sec": 122.0,
    }
    steps = [
        {"name": "bench", "lines": [bench_line]},
        {"name": "serving", "lines": [
            {"check": "predict_704sq_bs1", "ms_per_image": 26.6},
            {"check": "predict_1024sq_bs1", "ms_per_image": 75.0},  # +23.6%
        ]},
        {"name": "msda", "lines": [
            {"metric": "msda_detection_scale_n2m8d32p4",
             "pallas_fwd_ms": 9.9, "reference_fwd_ms": 62.0},
        ]},
    ]
    measured, flags = R.collate(steps)
    assert measured["infer_384_bs8_img_s"] == 231.0
    assert measured["serving_704_ms_per_image"] == 26.6
    assert measured["msda_pallas_fwd_ms"] == 9.9
    assert set(flags) == {"train_bs32_img_s", "serving_1024_ms_per_image"}
    assert flags["train_bs32_img_s"]["drift_pct"] == -10.7
    assert flags["serving_1024_ms_per_image"]["drift_pct"] == 23.6


def test_collate_empty_sweep_is_clean():
    measured, flags = R.collate([{"name": "bench", "lines": []}])
    assert measured == {} and flags == {}


def test_run_step_timeout_keeps_flushed_lines():
    """Code-review r5: a step child that printed (and flushed) its
    measurement lines and THEN hung in teardown keeps them — the
    TimeoutExpired path parses e.stdout instead of discarding it."""
    cmd = [
        sys.executable, "-c",
        "print('{\"check\": \"predict_704sq_bs1\", \"ms_per_image\": 26.6}',"
        " flush=True); import time; time.sleep(120)",
    ]
    step = R._run_step("fake", cmd, timeout_s=10)
    assert step["error"] == "timeout_10s"
    assert step["lines"] == [{"check": "predict_704sq_bs1", "ms_per_image": 26.6}]
    measured, _ = R.collate([step])
    assert measured == {"serving_704_ms_per_image": 26.6}


def test_collate_partial_record_writes_no_null():
    """Code-review r5: a matched record MISSING its value field (a check
    that errored and emitted a partial line) must leave the key out of
    ``measured`` entirely — a null entry reads as 'measured, value null'."""
    steps = [{"name": "serving", "lines": [
        {"check": "predict_704sq_bs1"},  # no ms_per_image
        {"check": "predict_1024sq_bs1", "ms_per_image": 61.0},
    ]}]
    measured, flags = R.collate(steps)
    assert "serving_704_ms_per_image" not in measured
    assert measured == {"serving_1024_ms_per_image": 61.0}
    assert flags == {}


def test_drift_handles_missing():
    assert R._drift(None, 10.0) is None
    assert R._drift(11.0, 10.0) == 10.0


from conftest import tpu_like_env as _tpu_like_env  # noqa: E402 (shared recipe)


def test_sweep_gates_fast_on_dead_tunnel(tmp_path):
    """A dead tunnel must NOT burn hours of per-step child timeouts: the
    probe gate writes a diagnostic artifact and exits fast, rc=0."""
    out = tmp_path / "REVAL.json"
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD="import sys; sys.exit(3)",
        DGTD_TPU_PROBE_TIMEOUT="5",
    )
    r = subprocess.run(
        [sys.executable, "-m", "dgtd_tpu.tools.revalidate_onchip",
         "--out", str(out)],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    artifact = json.loads(out.read_text())
    assert artifact["error"] == "tpu_probe_failed"
    assert artifact["steps"] == [] and artifact["measured"] == {}
    assert artifact["gate"]["probe_attempts"] == 1


def test_sweep_wait_mode_runs_on_tunnel_recovery(tmp_path):
    """--wait-for-tunnel: the sweep must launch the moment a probe succeeds
    (fake probe fails twice, recovers on attempt 3). All steps skipped so
    only the gate behavior is under test."""
    out = tmp_path / "REVAL.json"
    counter = tmp_path / "probe_count"
    probe_cmd = (
        "import json, os, sys\n"
        f"f = {str(counter)!r}\n"
        "n = int(open(f).read()) if os.path.exists(f) else 0\n"
        "open(f, 'w').write(str(n + 1))\n"
        "if n < 2:\n"
        "    sys.exit(3)\n"
        "print(json.dumps({'backend': 'tpu', 'n_devices': 1}))\n"
    )
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD=probe_cmd,
        DGTD_TPU_PROBE_TIMEOUT="30",
    )
    r = subprocess.run(
        [sys.executable, "-m", "dgtd_tpu.tools.revalidate_onchip",
         "--wait-for-tunnel", "--wait-retry", "0.1",
         "--skip-bench", "--skip-serving", "--skip-msda", "--skip-export",
         "--out", str(out)],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    artifact = json.loads(out.read_text())
    assert "error" not in artifact, artifact
    assert artifact["gate"]["probe_attempts"] == 3
    assert artifact["gate"]["backend"] == "tpu"


def test_sweep_gate_skipped_when_axon_unconfigured(tmp_path):
    """A falsy pool var means the axon plugin can't register in the child
    steps either — the gate is skipped with a flat, schema-stable record
    (the skip must key off the ENVIRONMENT the children inherit, not this
    process's in-process jax.config state)."""
    out = tmp_path / "REVAL.json"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "dgtd_tpu.tools.revalidate_onchip",
         "--skip-bench", "--skip-serving", "--skip-msda", "--skip-export",
         "--out", str(out)],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    artifact = json.loads(out.read_text())
    assert artifact["gate"] == {"skipped": "axon_unconfigured"}
    assert "error" not in artifact


def test_sweep_wait_mode_gives_up_at_wait_max(tmp_path):
    """wait mode with a never-recovering tunnel must stop at --wait-max with
    the diagnostic artifact (not loop forever)."""
    out = tmp_path / "REVAL.json"
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD="import sys; sys.exit(3)",
        DGTD_TPU_PROBE_TIMEOUT="5",
    )
    r = subprocess.run(
        [sys.executable, "-m", "dgtd_tpu.tools.revalidate_onchip",
         "--wait-for-tunnel", "--wait-retry", "0.1", "--wait-max", "12",
         "--out", str(out)],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    artifact = json.loads(out.read_text())
    assert artifact["error"] == "tpu_probe_failed"
    # each probe child pays the sitecustomize jax import (seconds, load-
    # dependent), so the attempt count inside the 12-s window varies — the
    # property under test is the bounded give-up, not the cadence (the
    # recovery test above pins multi-attempt looping)
    assert artifact["gate"]["probe_attempts"] >= 1
    assert artifact["gate"]["waited_s"] <= 60
