"""Device mesh + sharding helpers (TPU-first; no reference analogue).

The reference is single-GPU (SURVEY.md §2.6). The TPU framework's distributed
layer is batch data-parallelism over a 1-D mesh (gradient reductions become
XLA collectives over ICI automatically under jit), plus fold/ensemble/MC axes
realized with vmap over stacked parameters (scm/ensemble.py, train/kfold.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n_devices local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place every leaf of a batch pytree with its leading dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch: Any, multiple: int) -> Any:
    """Pad leading dims up to a multiple of the mesh size (static shapes)."""

    def _pad(x):
        n = x.shape[0]
        rem = (-n) % multiple
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    return jax.tree.map(_pad, batch)


def stack_params(param_trees: Sequence[Any]) -> Any:
    """Stack per-fold/per-member parameter pytrees along a new leading axis —
    the ensemble axis consumed by vmapped decode/inference (SURVEY.md I4/A11)."""
    import jax.numpy as jnp

    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)
