"""Explicit-collective data-parallel training via shard_map.

The default DP path lets GSPMD place the gradient reductions (parallel/mesh.py
+ jit — correct and usually optimal). This module is the explicit formulation
for when collective placement must be controlled by hand: the step runs
per-shard under ``shard_map`` and gradients are reduced across the mesh with
one XLA collective (an ICI all-reduce on a TPU slice); the optimizer update
happens identically on every device against replicated parameters.

Reduction semantics — pick to match the loss convention:

- ``loss_reduction="sum"`` (default for this codebase): gradients and loss are
  ``psum``-reduced, so the update is bit-equivalent to a single-device step on
  the concatenated global batch with the reference's sum-reduced losses
  (ref mnist_test/01 train.py:70-87 convention). Verified by
  tests/test_shard_step.py::test_sum_reduction_matches_single_device_trajectory.
- ``loss_reduction="mean"``: ``pmean`` — what GSPMD produces for mean losses
  and the convention of most DDP trainers. With sum-reduced losses this scales
  gradients by 1/n_shards (i.e. trains at lr/n) — use "sum" instead there.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_shard_map_step(
    loss_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
    loss_reduction: str = "sum",
) -> Callable:
    """Build an explicitly-collective DP step.

    loss_fn(params, batch, rng) -> scalar loss for ONE shard of the batch.
    Returns step(state, batch, rng) -> (state, loss) where batch's leading
    dim is sharded over ``axis`` and state is replicated. The returned fn is
    already jitted with the proper shardings."""
    if loss_reduction not in ("sum", "mean"):
        raise ValueError(f"loss_reduction must be 'sum' or 'mean', got {loss_reduction!r}")
    reduce = jax.lax.psum if loss_reduction == "sum" else jax.lax.pmean

    def per_shard(params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        # the ONLY cross-device communication: one gradient/loss all-reduce
        grads = reduce(grads, axis_name=axis)
        loss = reduce(loss, axis_name=axis)
        return loss, grads

    batch_spec = P(axis)
    rep = P()

    def step(state, batch, rng):
        # check_vma=False: under jax>=0.9's varying-axes tracking the
        # cotangent of P()-replicated params is auto-psum'd across the mesh,
        # so an explicit psum would double-count (8x grads on an 8-mesh;
        # Adam's scale invariance masks it, SGD would not). Opting out keeps
        # true per-shard local gradients so the explicit collective below is
        # the one and only reduction.
        shard_fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(rep, batch_spec, rep),
            out_specs=(rep, rep),
            check_vma=False,
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
