"""Device mesh + sharding rules.

TPU-native replacement for the reference's 2-process NCCL DDP
(script/train.sh:1, MMDistributedDataParallel — SURVEY.md §2.9): a
``jax.sharding.Mesh`` over ICI with batch-dim ``NamedSharding``; the gradient
all-reduce the reference gets from DDP is emitted automatically by XLA when
the jitted train step consumes batch-sharded inputs and produces replicated
params.

Axes:
  * ``data``  — batch sharding (DDP parity; the only parallelism the
    reference has);
  * ``space`` — optional spatial sharding of H for the high-res serving
    config (halo exchange for stencils handled by the Pallas diffusion
    kernel / XLA conv padding).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // space
    assert data * space == n, f"mesh {data}x{space} != {n} devices"
    dev_array = np.array(devices).reshape(data, space)
    return Mesh(dev_array, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 over data; with a space axis, shard H (dim 1) too."""
    if mesh.shape.get("space", 1) > 1:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator: Optional[str] = None) -> None:
    """Multi-host (DCN) initialization; no-op in single-process runs."""
    if jax.process_count() > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)
