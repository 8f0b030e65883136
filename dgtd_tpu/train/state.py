"""Train state + jitted step builders (donated buffers, sharded batch)."""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, rng, image_size: int, tx) -> TrainState:
    variables = model.init(rng, (1, image_size, image_size, 3))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(model, tx, repl_sharding=None) -> Callable:
    """Build the jitted SPMD train step.

    With a batch-sharded input and replicated state, XLA inserts the gradient
    all-reduce over ICI automatically (DDP parity without NCCL plumbing).
    ``state`` is donated so parameter/optimizer buffers update in place.

    ``repl_sharding``: the mesh's replicated NamedSharding. When given, the
    gradient tree is sharding-constrained to it — without the constraint the
    partitioner invents degenerate size-1-dim tile assignments for bias/scale
    grad partial sums on 2-D (data×space) meshes and falls back to
    "involuntary full rematerialization" (see tests/test_sharding.py).
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict]:
        from ..data.device_norm import normalize_batch

        batch = normalize_batch(batch)  # uint8-ingest: no-op for float input
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, (aux, new_mutable) = model.loss(
                variables, batch, rngs={"dropout": step_rng}
            )
            return loss, (aux, new_mutable)

        (loss, (aux, new_mutable)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if repl_sharding is not None:
            grads = jax.lax.with_sharding_constraint(grads, repl_sharding)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_mutable.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
        )
        return new_state, aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, with_extras: bool = False) -> Callable:
    """``with_extras`` returns (prob, extras) from the SAME forward — the
    visualization path needs the texture extra and must not pay a second
    full forward for it."""

    def eval_step(variables, image, depth):
        from ..data.device_norm import normalize_image, scale_plane

        prob, extras = model.predict(variables, normalize_image(image), scale_plane(depth))
        return (prob, extras) if with_extras else prob

    return jax.jit(eval_step)
