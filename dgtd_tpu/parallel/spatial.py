"""Spatially-sharded diffusion with explicit halo exchange (serving path).

SURVEY.md §5/§7 plan the TPU-native extension for the high-res serving
config: shard H×W over the mesh with halo exchange for the k×k diffusion
stencil. XLA's auto-partitioner already handles the jnp stencil under pjit
(tests/test_sharding.py), but the Pallas kernel is opaque to the partitioner —
this module runs it under ``shard_map``: each device holds an H-shard of the
grid, exchanges ``r = k//2``-row halos with its mesh neighbors via
``jax.lax.ppermute`` per diffusion step, and runs the per-shard stencil
locally (Pallas v2 kernel on TPU, the jnp reference elsewhere/when tiny).

Halo traffic per step is 2·r·W·C floats per device boundary — rides ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _exchange_halos(x_local: jnp.ndarray, r: int, axis: str) -> jnp.ndarray:
    """Pad a local (B, Hs, W, C) H-shard with r rows from ring neighbors.

    Edge shards receive zeros (the stencil's zero padding) — implemented by
    masking the wrapped ppermute payloads on the boundary devices.
    """
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    top_rows = x_local[:, :r]  # rows this shard sends DOWN to its successor
    bot_rows = x_local[:, -r:]  # rows this shard sends UP to its predecessor

    # from predecessor (i-1) comes its bottom -> our top halo
    from_prev = lax.ppermute(bot_rows, axis, [(i, (i + 1) % n) for i in range(n)])
    # from successor (i+1) comes its top -> our bottom halo
    from_next = lax.ppermute(top_rows, axis, [(i, (i - 1) % n) for i in range(n)])
    zero = jnp.zeros_like(from_prev)
    top_halo = jnp.where(idx == 0, zero, from_prev)
    bot_halo = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([top_halo, x_local, bot_halo], axis=1)


def _local_step(x_halo: jnp.ndarray, norm_weight: jnp.ndarray, kernel: int, use_pallas: bool, interpret: bool):
    """One stencil step on a halo'd local shard.

    x_halo: (B, Hs+2r, W, C) — H halos present, W zero-padding handled by the
    stencil itself; norm_weight: (B, Hs, W, C, k²) local rows only.
    """
    r = kernel // 2
    if use_pallas:
        from ..ops.diffusion_pallas import diffusion_step_pallas_v2

        b, hh, w, c = x_halo.shape
        xp = x_halo.transpose(0, 3, 1, 2).reshape(b * c, hh, w)
        # plane-layout weights padded with zero rows to align with the halo'd x
        wp = (
            norm_weight.transpose(0, 3, 4, 1, 2)
            .reshape(b * c, kernel * kernel, hh - 2 * r, w)
        )
        wp = jnp.pad(wp, ((0, 0), (0, 0), (r, r), (0, 0)))
        out = diffusion_step_pallas_v2(xp, wp, kernel, interpret=interpret)
        out = out.reshape(b, c, hh, w).transpose(0, 2, 3, 1)
        return out[:, r:-r]
    # jnp reference on the halo'd shard
    from ..models.diffusion import message_passing_step

    wt_pad = jnp.pad(norm_weight, ((0, 0), (r, r), (0, 0), (0, 0), (0, 0)))
    return message_passing_step(x_halo, wt_pad, kernel)[:, r:-r]


def spatial_diffusion(
    x: jnp.ndarray,
    norm_weight: jnp.ndarray,
    kernel: int,
    steps: int,
    mesh: Mesh,
    axis: str = "space",
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run ``steps`` stencil iterations with H sharded over ``mesh[axis]``.

    x: (B, H, W, C); norm_weight: (B, H, W, C, k²) (already normalized).
    H must divide evenly by the axis size, and each shard must be at least
    as tall as the halo radius (single-neighbor ppermute cannot source rows
    from two shards away).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    r = kernel // 2
    n_shards = mesh.shape[axis]
    h = x.shape[1]
    if r == 0:
        # kernel=1 is pointwise (no neighborhood): `x_local[:, -0:]` would
        # send the FULL shard as a "halo" and `out[:, 0:-0]` slices empty —
        # run the stencil steps shard-locally with no exchange instead.
        def pointwise(x_local, w_local):
            for _ in range(steps):
                x_local = x_local * w_local[..., 0]
            return x_local

        spec = P(None, axis, None, None)
        return shard_map(
            pointwise,
            mesh=mesh,
            in_specs=(spec, P(None, axis, None, None, None)),
            out_specs=spec,
            check_vma=False,
        )(x, norm_weight)
    if h % n_shards != 0:
        raise ValueError(f"H={h} must divide evenly over {n_shards} '{axis}' shards")
    if h // n_shards < r:
        raise ValueError(
            f"shard height {h // n_shards} < halo radius {r} (kernel {kernel}): "
            f"use fewer '{axis}' shards or a smaller kernel"
        )

    def local_fn(x_local, w_local):
        for _ in range(steps):
            x_halo = _exchange_halos(x_local, r, axis)
            x_local = _local_step(x_halo, w_local, kernel, use_pallas, interpret)
        return x_local

    spec_x = P(None, axis, None, None)
    spec_w = P(None, axis, None, None, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec_x, spec_w),
        out_specs=spec_x,
        # pallas_call outputs carry no varying-mesh-axis metadata
        check_vma=False,
    )
    return fn(x, norm_weight)
