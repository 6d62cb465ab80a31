"""Explicit-collective data-parallel training via shard_map.

The default DP path lets GSPMD place the gradient reductions (parallel/mesh.py
+ jit — correct and usually optimal). This module is the explicit formulation
for when collective placement must be controlled by hand: the step runs
per-shard under ``shard_map``, gradients are averaged across the mesh with
``jax.lax.pmean`` (an ICI all-reduce on a TPU slice), and the optimizer
update happens identically on every device against replicated parameters.

Semantics note: per-shard losses are *mean-reduced* via pmean, so loss
functions with sum reduction (the reference's convention) see their gradients
scaled by 1/n_shards relative to the global-batch sum — identical to what
GSPMD produces for a mean loss, and the convention distributed data parallel
trainers use. Pair it with mean-reduced losses, or fold the factor into the
learning rate.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_shard_map_step(
    loss_fn: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """Build an explicitly-collective DP step.

    loss_fn(params, batch, rng) -> scalar loss for ONE shard of the batch.
    Returns step(state, batch, rng) -> (state, loss) where batch's leading
    dim is sharded over ``axis`` and state is replicated. The returned fn is
    already jitted with the proper shardings."""

    def per_shard(params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        # the ONLY cross-device communication: one gradient/loss all-reduce
        grads = jax.lax.pmean(grads, axis_name=axis)
        loss = jax.lax.pmean(loss, axis_name=axis)
        return loss, grads

    batch_spec = P(axis)
    rep = P()

    def step(state, batch, rng):
        shard_fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(rep, batch_spec, rep),
            out_specs=(rep, rep),
        )
        loss, grads = shard_fn(state.params, batch, rng)
        return state.apply_gradients(grads), loss

    return jax.jit(
        step,
        in_shardings=(
            None,
            NamedSharding(mesh, batch_spec),
            NamedSharding(mesh, rep),
        ),
    )
