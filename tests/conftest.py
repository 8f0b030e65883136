"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world replacement for "fake backends" — multi-chip sharding
is validated on host CPU devices (SURVEY.md §4), and numerics are checked at
float32 on CPU where torch (CPU) serves as the oracle for op semantics.

Note: this image pre-imports jax at interpreter startup (axon sitecustomize),
so the platform switch must go through jax.config, not env vars.
"""

import os
import sys

# For any subprocesses: JAX_PLATFORMS=cpu ALONE is not hang-proof — the axon
# plugin registers whenever PALLAS_AXON_POOL_IPS is truthy and backend init
# can then block on a dead tunnel even under env-var CPU forcing (r4,
# live-verified). Clear both so every test subprocess is tunnel-free by
# default; tests that exercise the TPU watchdog re-set the pool var
# explicitly (test_bench_watchdog._tpu_like_env).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

# Compile-time trims, CPU-test-only (round-4 verdict #7: the fast suite had
# crept to ~11 min, dominated by XLA CPU compiles of jitted full-model
# graphs). Same trims the multichip dryrun and the zero-fallback compile
# test already use: they skip expensive LLVM passes / backend optimization,
# which changes compile TIME only — op semantics are unchanged, so oracle
# tolerances are unaffected. Parsed at first backend init, so setting them
# here (before any test touches jax) is effective despite the sitecustomize
# pre-import.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_llvm_disable_expensive_passes=true"
    + " --xla_backend_optimization_level=1"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to XLA flag (works pre-backend-init)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --- shared helpers for watchdog-style subprocess tests ---------------------

#: DGTD_TPU_PROBE_CMD payload faking an instantly-live TPU probe child. The
#: probe contract requires an explicit backend report — a bare '{}' is a
#: protocol failure, not a live chip (utils/tpu_probe.LIVE_TPU_BACKENDS).
FAKE_LIVE_PROBE = (
    "import json; print(json.dumps({'backend': 'tpu', 'n_devices': 1}))"
)


def tpu_like_env(**extra):
    """Env for a subprocess that must BELIEVE it targets TPU: strip this
    conftest's CPU forcing, keep the axon pool var truthy (the
    tunnel-configured state the watchdogs defend against — a falsy pool var
    means the plugin never registers and nothing can hang). Fake probe
    payloads never import jax, and callers put an outer timeout on every
    subprocess, so a regression shows up as a failure, not a hang."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PALLAS_AXON_POOL_IPS"] = env.get("PALLAS_AXON_POOL_IPS") or "127.0.0.1"
    env.update(extra)
    return env
