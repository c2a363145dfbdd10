"""Parallelism surface: mesh construction and sharding helpers
(SURVEY.md §2.10) on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_danet_tpu.parallel import (
    DATA_AXIS,
    ENSEMBLE_AXIS,
    batch_sharding,
    ensemble_batch_sharding,
    ensemble_sharding,
    make_mesh,
    replicated,
)


def test_make_mesh_shapes():
    mesh = make_mesh(n_ensemble=2, n_data=4)
    assert mesh.axis_names == (ENSEMBLE_AXIS, DATA_AXIS)
    assert mesh.devices.shape == (2, 4)
    # -1 uses all remaining devices
    mesh1 = make_mesh(n_ensemble=1)
    assert mesh1.devices.size == len(jax.devices())


def test_make_mesh_rejects_oversubscription():
    with pytest.raises(ValueError):
        make_mesh(n_ensemble=4, n_data=4)   # 16 > 8 devices


def test_sharding_placements():
    mesh = make_mesh(n_ensemble=2, n_data=4)
    batch = jax.device_put(jnp.arange(8 * 3.0).reshape(8, 3),
                           batch_sharding(mesh))
    # batch axis split over 'data' (4 ways), replicated over 'ensemble'
    assert batch.sharding.shard_shape(batch.shape) == (2, 3)

    stacked = jax.device_put(jnp.zeros((2, 8, 3)),
                             ensemble_batch_sharding(mesh))
    assert stacked.sharding.shard_shape(stacked.shape) == (1, 2, 3)

    params = jax.device_put(jnp.zeros((2, 5)), ensemble_sharding(mesh))
    assert params.sharding.shard_shape(params.shape) == (1, 5)

    rep = jax.device_put(jnp.zeros((4, 4)), replicated(mesh))
    assert rep.sharding.shard_shape(rep.shape) == (4, 4)


def test_psum_over_data_axis():
    """XLA collective over the mesh: a shard_map psum matches the global
    sum — the allreduce pattern the GAN gradients ride."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_ensemble=1, n_data=8)
    x = jnp.arange(16.0).reshape(16, 1)

    def local_sum(xs):
        return jax.lax.psum(xs.sum(), axis_name=DATA_AXIS)

    out = jax.jit(jax.shard_map(local_sum, mesh=mesh,
                                in_specs=P(DATA_AXIS),
                                out_specs=P()))(x)
    np.testing.assert_allclose(float(out), float(x.sum()))
