"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2.10) — its only "parallelism" is a
sequential loop over 5 ensemble members. Here scaling is native: a 2-D
`jax.sharding.Mesh` with ('ensemble', 'data') axes. Batches shard over
'data' (gradient allreduce rides ICI, inserted by XLA), ensemble members
shard over 'ensemble' via member-stacked params (scanned locally).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENSEMBLE_AXIS = "ensemble"
DATA_AXIS = "data"


def make_mesh(
    n_ensemble: int = 1,
    n_data: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build an ('ensemble', 'data') mesh.

    n_data = -1 uses all remaining devices. Works with real TPU slices and
    with CPU virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=N).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = max(1, len(devices) // max(1, n_ensemble))
    n_used = n_ensemble * n_data
    if n_used > len(devices):
        raise ValueError(
            f"mesh ({n_ensemble}x{n_data}) needs {n_used} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n_used]).reshape(n_ensemble, n_data)
    return Mesh(grid, (ENSEMBLE_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def ensemble_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(member, batch, ...) arrays: member over 'ensemble', batch over 'data'."""
    return NamedSharding(mesh, P(ENSEMBLE_AXIS, DATA_AXIS))


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Member-stacked params: leading axis over 'ensemble', rest replicated."""
    return NamedSharding(mesh, P(ENSEMBLE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
