"""bench.py / __graft_entry__ hang-proofing against a dead axon TPU tunnel.

Round-3 postmortem: BENCH_r03.json was rc=124 with no JSON line because a
dead tunnel blocks jax backend init forever and bench.py touched the backend
at import time. The driver contract is ONE parseable JSON line no matter
what — these tests fake a hung/dead backend via the DGTD_TPU_PROBE_CMD /
DGTD_BENCH_HANG_FOR_TEST hooks and pin the fast-diagnostic behavior.
"""

import json
import os
import subprocess
import sys
import time

from conftest import FAKE_LIVE_PROBE, tpu_like_env as _tpu_like_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _last_json_line(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise AssertionError(f"no JSON line in output:\n{stdout}")


def test_bench_emits_diagnostic_line_on_hung_tunnel():
    """A probe child that never returns -> {"error": "tpu_unreachable"},
    exit 0, well inside the driver's timeout. DGTD_BENCH_DEADLINE is small
    so the retry loop gives up after attempt 1 (retry behavior has its own
    tests below)."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD="import time; time.sleep(300)",
        DGTD_TPU_PROBE_TIMEOUT="1.5",
        DGTD_BENCH_DEADLINE="10",
    )
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    elapsed = time.time() - t0
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "tpu_unreachable"
    assert rec["value"] is None
    assert rec["metric"].startswith("cod_bf16_384sq_bs8_infer")
    assert rec["probe_s"] >= 1.5
    assert rec["probe_attempts"] == 1
    assert rec["waited_s"] >= 1.5
    assert elapsed < 60, f"diagnostic path took {elapsed:.0f}s"


def test_bench_emits_diagnostic_line_on_crashing_backend():
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD="import sys; sys.exit(3)",
        DGTD_TPU_PROBE_TIMEOUT="30",
        DGTD_BENCH_DEADLINE="10",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "tpu_probe_failed"
    assert rec["value"] is None


def test_bench_deadline_covers_mid_bench_hang():
    """Probe succeeds but the worker hangs (tunnel died mid-bench): the
    parent's overall deadline kills it and emits the diagnostic line."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD=FAKE_LIVE_PROBE,  # instant-success probe
        DGTD_BENCH_HANG_FOR_TEST="300",
        DGTD_BENCH_DEADLINE="2",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "bench_deadline_exceeded"
    assert rec["value"] is None


def test_graft_entry_refuses_fast_on_hung_tunnel():
    """entry() must raise (fast) instead of blocking in backend init."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD="import time; time.sleep(300)",
        DGTD_TPU_PROBE_TIMEOUT="1.5",
    )
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.entry()"],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode != 0
    assert "TPU backend unreachable" in r.stderr


def test_probe_ok_path_reports_backend():
    """A healthy probe returns ok + the child's backend report."""
    from dgtd_tpu.utils.tpu_probe import probe_tpu

    old = os.environ.get("DGTD_TPU_PROBE_CMD")
    os.environ["DGTD_TPU_PROBE_CMD"] = (
        "import json; print(json.dumps({'backend': 'tpu', 'n_devices': 1}))"
    )
    try:
        probe = probe_tpu(timeout=30)
    finally:
        if old is None:
            os.environ.pop("DGTD_TPU_PROBE_CMD", None)
        else:
            os.environ["DGTD_TPU_PROBE_CMD"] = old
    assert probe["ok"] and probe["backend"] == "tpu" and probe["n_devices"] == 1


def test_backend_already_initialized_detection():
    """Pins the private-API dependency (jax._src.xla_bridge._backends): an
    initialized backend must be detected so entry()/bench skip the probe —
    a probe child would contend for the one-process axon tunnel."""
    import jax

    from dgtd_tpu.utils.tpu_probe import backend_already_initialized

    jax.devices()  # conftest pins CPU; initializes the backend
    assert backend_already_initialized()


def test_env_cpu_does_not_bypass_watchdog():
    """Code-review r4 finding 1 (live-verified): env JAX_PLATFORMS=cpu does
    NOT stop the axon plugin from registering when the pool var is truthy —
    backend init still hangs on a dead tunnel. The watchdog must therefore
    run (and catch the hang) even under env-var CPU forcing; only the pool
    var being falsy or the in-process jax.config update are hang-proof."""
    env = _tpu_like_env(
        JAX_PLATFORMS="cpu",  # must NOT count as forced-cpu
        DGTD_TPU_PROBE_CMD="import time; time.sleep(300)",
        DGTD_TPU_PROBE_TIMEOUT="1.5",
        DGTD_BENCH_DEADLINE="10",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "tpu_unreachable", rec


def test_probe_reporting_cpu_backend_fails_the_bench():
    """Code-review r4 finding 5: a probe child that silently fell back to
    CPU (axon plugin failed fast) must not let the bench publish a CPU
    number under the per-chip metric."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD=(
            "import json; print(json.dumps({'backend': 'cpu', 'n_devices': 1}))"
        ),
        DGTD_BENCH_DEADLINE="10",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "tpu_backend_unavailable", rec
    assert rec["value"] is None


HEADLINE = (
    '{"metric": "cod_bf16_384sq_bs8_infer_images_per_sec_per_chip",'
    ' "value": 123.0, "unit": "images/sec/chip", "vs_baseline": null}'
)


def test_bench_probe_retry_recovers_mid_window(tmp_path):
    """Round-4 verdict #1: a tunnel that comes back on the Nth probe must
    still yield a real measurement. The fake probe fails twice, succeeds on
    attempt 3 (counter file); the fake worker prints a valid headline."""
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
        DGTD_TPU_PROBE_RETRY="0.1",
        DGTD_BENCH_DEADLINE="90",
        DGTD_BENCH_RESERVE="1",
        DGTD_BENCH_FAKE_RESULT_FOR_TEST=HEADLINE,
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["value"] == 123.0, rec
    assert rec["probe_attempts"] == 3, rec
    assert rec["waited_s"] >= 0.2, rec


def test_bench_diagnostic_reports_probe_attempts():
    """A window wide enough for several probes but no recovery must report
    how many attempts were burned — the artifact proves the tunnel was down
    for the WHOLE window, not just at t=0."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD="import sys; sys.exit(3)",
        DGTD_TPU_PROBE_TIMEOUT="2",
        DGTD_TPU_PROBE_RETRY="0.1",
        DGTD_BENCH_DEADLINE="15",
        DGTD_BENCH_RESERVE="1",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    # under load a probe child can be timeout-killed before its sys.exit(3)
    # lands, so the LAST attempt's error may be either flavor of dead
    assert rec["error"] in ("tpu_probe_failed", "tpu_unreachable"), rec
    assert rec["probe_attempts"] >= 2, rec
    assert rec["value"] is None


def test_bench_worker_teardown_crash_keeps_headline():
    """Advisor r4 #2: a worker that prints its valid headline line and THEN
    exits nonzero (teardown crash) must not have its measurement replaced by
    a value=null bench_worker_exit line — the parent re-emits the headline
    LAST, tagged with the worker's exit code."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD=FAKE_LIVE_PROBE,
        DGTD_BENCH_FAKE_RESULT_FOR_TEST=HEADLINE,
        DGTD_BENCH_FAKE_EXIT_FOR_TEST="3",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["value"] == 123.0, rec
    assert rec["worker_exit"] == 3, rec
    assert "bench_worker_exit_3" not in r.stdout


def test_probe_without_backend_report_is_not_live():
    """Code-review r5: a probe child that exits 0 WITHOUT a parseable
    backend report (payload override, stdout pollution, lost buffered line)
    is a protocol failure, not a live chip — the bench must refuse to
    proceed, like the CPU-fallback case."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD="print('{}')",  # exits 0, reports no backend
        DGTD_BENCH_DEADLINE="10",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "tpu_backend_unavailable", rec
    assert rec["value"] is None


def test_bench_worker_teardown_hang_keeps_headline():
    """Code-review r5: a worker that prints its valid headline and THEN
    HANGS in teardown (the dead-tunnel blocking-C++-client mode the watchdog
    exists for) must keep its measurement — the TimeoutExpired path must
    look for the headline in the captured output like the nonzero-exit path
    does, not blindly emit a value=null bench_deadline_exceeded line."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD=FAKE_LIVE_PROBE,
        DGTD_BENCH_FAKE_RESULT_FOR_TEST=HEADLINE,
        DGTD_BENCH_HANG_AFTER_RESULT_FOR_TEST="300",
        # wide enough for probe-child + worker interpreter startups (~3 s
        # each with the sitecustomize jax import) BEFORE the headline print;
        # the 300-s hang then trips the deadline
        DGTD_BENCH_DEADLINE="25",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["value"] == 123.0, rec
    assert rec["worker_timeout"] is True, rec
    assert "bench_deadline_exceeded" not in r.stdout


def test_bench_worker_clean_exit_without_headline_still_emits_line():
    """A worker that exits 0 without ever printing a valid headline
    (anomalous — wrong metric name, empty output) must still leave the
    driver ONE parseable JSON line: a bench_no_headline diagnostic."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD=FAKE_LIVE_PROBE,
        DGTD_BENCH_FAKE_RESULT_FOR_TEST='{"metric": "wrong_metric", "value": 1.0}',
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "bench_no_headline", rec
    assert rec["value"] is None


def test_bench_partial_output_does_not_glue_diagnostic():
    """Advisor r4 #1: a worker killed mid-print must not glue its partial
    line onto the parent's diagnostic JSON. The fake worker writes an
    unterminated fragment then hangs past the deadline; the last line of
    parent output must still be a clean parseable diagnostic."""
    env = _tpu_like_env(
        DGTD_TPU_PROBE_CMD=FAKE_LIVE_PROBE,
        DGTD_BENCH_PARTIAL_FOR_TEST='{"metric": "cod_bf16_partial_fragment',
        DGTD_BENCH_HANG_FOR_TEST="300",
        DGTD_BENCH_DEADLINE="3",
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    last_line = r.stdout.strip().splitlines()[-1]
    rec = json.loads(last_line)  # must parse — the glue bug breaks this
    assert rec["error"] == "bench_deadline_exceeded", rec
    assert rec["value"] is None
