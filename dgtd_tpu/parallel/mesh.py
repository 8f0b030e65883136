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

import contextlib
import contextvars
from typing import Optional, Sequence

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
    """Multi-host (DCN) initialization; no-op in single-process runs.

    MUST not touch the backend before deciding: ``jax.process_count()``
    initializes XLA, after which ``jax.distributed.initialize`` raises
    ("must be called before any JAX calls"). Detection therefore uses only
    the explicit ``coordinator`` argument and cluster environment markers
    (the standard jax coordinator vars, TPU pod metadata, SLURM/OMPI).
    """
    import os

    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)
        return
    explicit = (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    )
    if any(os.environ.get(m) for m in explicit):
        # cluster plugins auto-detect coordinator/process ids from the env
        jax.distributed.initialize()
        return

    def _env_size(var: str) -> int:
        try:
            return int(os.environ.get(var, "1"))
        except ValueError:
            return 1

    # Size markers only count above 1: a 1-node 1-task SLURM job or a 1-rank
    # OMPI launch is a plain single-process run, where coordinator
    # auto-detection adds startup latency or fails outright. SLURM needs the
    # TASK count too — `srun -N1 -n4` is a multi-process launch on one node
    # (SLURM_JOB_NUM_NODES=1, SLURM_NTASKS=4) and must initialize.
    if (
        _env_size("SLURM_JOB_NUM_NODES") > 1
        or _env_size("SLURM_NTASKS") > 1
        or _env_size("SLURM_STEP_NUM_TASKS") > 1
        or _env_size("OMPI_COMM_WORLD_SIZE") > 1
    ):
        jax.distributed.initialize()


# ---------------------------------------------------------------------------
# Ambient-mesh activation constraints (2-D data×space sharding)
# ---------------------------------------------------------------------------

#: Mesh made visible to model code while TRACING a sharded step (a true
#: ``contextvars.ContextVar`` so concurrent traces on other threads can't
#: observe another thread's mesh). Model modules call
#: :func:`spatial_constraint` on activations; with no active mesh
#: (single-chip, tests, serving export) it is an exact no-op, so the
#: constraint surface costs nothing outside the sharded train path.
_ACTIVE_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "dgtd_active_mesh", default=None
)


@contextlib.contextmanager
def active_mesh(mesh: Optional[Mesh]):
    """Make ``mesh`` visible to :func:`spatial_constraint` while tracing.

    Only tracing needs the context (the constraint is baked into the jaxpr);
    execution does not.
    """
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.reset(token)


def spatial_constraint(x):
    """Constrain a (B, H, ..., C) or (B, N, C) activation to
    ``P('data', 'space')`` under an active 2-D mesh; identity otherwise.

    Without explicit constraints the partitioner must guess shardings for
    every intermediate of the data×space train step, and on the backward
    pass it invents degenerate size-1-dim tile assignments for bias/scale
    gradient partial sums, falling back to "involuntary full
    rematerialization" (replicate + repartition) — correct but
    ICI-wasteful and warning-spamming. Anchoring the activations at LN/Conv
    boundaries makes propagation consistent end to end.

    Dims that don't divide the mesh axis are left unconstrained (e.g. H=1
    stage-4 features of tiny test configs).
    """
    mesh = _ACTIVE_MESH.get()
    if mesh is None or not hasattr(x, "ndim") or x.ndim < 2:
        return x
    data = mesh.shape.get("data", 1)
    space = mesh.shape.get("space", 1)
    if space <= 1:
        # pure-DP: batch dim only (matches batch_sharding's 1-D spec)
        if data > 1 and x.shape[0] % data == 0:
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))
        return x
    spec_dims = [None] * x.ndim
    if x.shape[0] % data == 0:
        spec_dims[0] = "data"
    # Space-shard H (or the token dim) whenever it divides the axis. An
    # indivisible H (deep pyramid tails of tiny test shapes) is pinned
    # REPLICATED by the explicit P(..., None, ...) — anchoring propagation
    # instead of leaving the partitioner to invent degenerate size-1-dim
    # tile assignments (its "involuntary full rematerialization" fallback).
    # At the real recipe shapes (384² train, 1024² serving) every pyramid
    # level divides, so the whole backbone stays 2-D sharded.
    if x.ndim >= 3 and x.shape[1] % space == 0:
        spec_dims[1] = "space"
    if all(d is None for d in spec_dims):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec_dims)))
