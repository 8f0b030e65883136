"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world replacement for "fake backends" — multi-chip sharding
is validated on host CPU devices (SURVEY.md §4), and numerics are checked at
float32 on CPU where torch (CPU) serves as the oracle for op semantics.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
