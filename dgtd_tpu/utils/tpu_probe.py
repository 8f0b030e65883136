"""Bounded TPU-backend liveness probe.

The axon remote-TPU tunnel can die silently; once it does, *any* call that
initializes the jax backend (``jax.devices()``, ``jax.default_backend()``)
blocks indefinitely in the C++ client with no Python-level timeout. Round 3
lost its driver bench to exactly this (BENCH_r03.json: rc=124, no JSON line).

The fix is structural: never touch the backend in a process you cannot
afford to lose. ``probe_tpu()`` initializes the backend in a CHILD process
under a hard deadline and reports liveness; callers fail fast with a
diagnostic instead of hanging. (There is no in-process alternative:
SIGALRM cannot interrupt the blocked C++ call, and once the backend attempt
starts in-process the interpreter is stuck.)

Env knobs:
  DGTD_TPU_PROBE_TIMEOUT  seconds before the probe child is killed (default 120)
  DGTD_TPU_PROBE_CMD      override the probe's ``python -c`` payload (tests
                          fake a hung/dead backend with a sleep/exit payload)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Dict

DEFAULT_TIMEOUT = 120.0

_PROBE_PAYLOAD = (
    "import jax, json; "
    "print(json.dumps({'backend': jax.default_backend(), "
    "'n_devices': len(jax.devices())}))"
)


def probe_timeout() -> float:
    return float(os.environ.get("DGTD_TPU_PROBE_TIMEOUT", DEFAULT_TIMEOUT))


def probe_tpu(timeout: float | None = None) -> Dict:
    """Initialize the jax backend in a child process with a hard deadline.

    Returns a JSON-serializable dict:
      {"ok": True,  "backend": "tpu", "n_devices": 1, "probe_s": 4.2}
      {"ok": False, "error": "tpu_unreachable", "probe_s": 120.0}      (hang)
      {"ok": False, "error": "tpu_probe_failed", "probe_s": ..., ...}  (crash)
    """
    import json as _json

    if timeout is None:
        timeout = probe_timeout()
    payload = os.environ.get("DGTD_TPU_PROBE_CMD", _PROBE_PAYLOAD)
    env = dict(os.environ)
    # the probe must see the same backend the caller would (drop any
    # test-harness CPU forcing only if the caller didn't set it — i.e. keep
    # env as-is; callers that force CPU should not be probing at all)
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", payload],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return {
            "ok": False,
            "error": "tpu_unreachable",
            "probe_s": round(time.time() - t0, 1),
        }
    probe_s = round(time.time() - t0, 1)
    if r.returncode != 0:
        return {
            "ok": False,
            "error": "tpu_probe_failed",
            "probe_s": probe_s,
            "detail": (r.stderr or "").strip()[-200:],
        }
    info = {}
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            info = _json.loads(line)
            break
        except ValueError:
            continue
    return {"ok": True, "probe_s": probe_s, **info}


#: probe-child backend reports that count as a live TPU. A probe child that
#: exits 0 WITHOUT a parseable backend report is a protocol failure, not a
#: live chip — treating it as live would wave through exactly the class of
#: silent fallback the probe exists to catch (backend=None is NOT accepted).
LIVE_TPU_BACKENDS = ("tpu", "axon")


def probe_tpu_retrying(retry_every: float, can_retry, on_wait=None) -> tuple:
    """Retry ``probe_tpu`` until a live TPU backend appears or the caller's
    budget runs out — the shared loop behind bench.py's watchdog and the
    revalidation sweep's gate (one definition, or the two diverge).

    ``can_retry(elapsed_s, sleep_s)`` decides whether ANOTHER attempt fits
    the caller's budget after a failure; ``on_wait(record, sleep_s)`` (if
    given) is called before each sleep. Attempts start ``retry_every``
    seconds apart (never overlapping — the probe child itself takes time).

    Returns ``(ok, record)`` where record always carries ``probe_attempts``
    and ``waited_s`` plus the last probe's fields; on failure it also has
    ``error`` (``tpu_backend_unavailable`` when the probe child silently
    fell back to a non-TPU backend — never publish a CPU number under a
    per-chip metric)."""
    t0 = time.time()
    attempts = 0
    while True:
        attempts += 1
        t_attempt = time.time()
        probe = probe_tpu()
        ok = probe.pop("ok", False)
        record = {
            "probe_attempts": attempts,
            "waited_s": round(time.time() - t0, 1),
            **probe,
        }
        if ok and probe.get("backend") in LIVE_TPU_BACKENDS:
            return True, record
        record["error"] = (
            probe.get("error", "tpu_unreachable") if not ok else "tpu_backend_unavailable"
        )
        elapsed = time.time() - t0
        sleep_s = max(0.0, retry_every - (time.time() - t_attempt))
        if not can_retry(elapsed, sleep_s):
            return False, record
        if on_wait is not None:
            on_wait(record, sleep_s)
        time.sleep(sleep_s)


def backend_already_initialized() -> bool:
    """True when THIS process already has a live jax backend.

    Two reasons to check before probing: (a) touching an already-initialized
    backend cannot hang, so the probe is unnecessary; (b) the axon tunnel
    serves strictly ONE process at a time — a probe child spawned while this
    process holds the tunnel would queue/hang and time out, turning a
    healthy backend into a false 'tpu_unreachable'."""
    jax = sys.modules.get("jax")
    if jax is None:
        return False
    try:
        from jax._src import xla_bridge as xb

        return bool(getattr(xb, "_backends", None))
    except Exception:
        return False


def backend_is_forced_cpu() -> bool:
    """True when backend init in this process provably cannot touch the axon
    tunnel — probing TPU liveness there is pointless.

    IMPORTANT: env ``JAX_PLATFORMS=cpu`` is NOT sufficient. The axon plugin
    registers at interpreter start whenever ``PALLAS_AXON_POOL_IPS`` is
    truthy (sitecustomize), and once registered, backend init can block on a
    dead tunnel even under env-var CPU forcing (verified: rc=124 with
    JAX_PLATFORMS=cpu + a truthy pool var). Only two states are hang-proof:
    the pool var is falsy/absent (the plugin never registered), or the
    IN-PROCESS ``jax.config.update("jax_platforms", "cpu")`` ran before any
    backend init (the test conftest's path, verified across every suite run
    against the dead tunnel)."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # axon never registered in this process tree
    jax = sys.modules.get("jax")
    if jax is not None:
        try:
            if str(getattr(jax.config, "jax_platforms", "") or "").lower() == "cpu":
                return True
        except Exception:
            pass
    return False


def enable_tpu_compile_cache() -> None:
    """Persistent compilation cache — TPU-only (cross-machine CPU AOT cache
    entries can SIGILL this host). Touches the backend: callers must only
    invoke this where backend init is known safe (after a probe, in a
    worker, or under a forced-CPU config), NEVER at import time — a dead
    axon tunnel blocks backend init forever."""
    import jax

    try:
        if jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dgtd")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
