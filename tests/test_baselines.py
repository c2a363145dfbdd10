"""Baseline model zoo: HAT, Autoencoder/AETrainer, ScaleInvariantNetwork."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_danet_tpu.models.ae import AETrainer, Autoencoder
from gan_danet_tpu.models.hat import (
    HAT,
    _relative_position_index,
    pixel_shuffle,
    window_merge,
    window_partition,
)
from gan_danet_tpu.models.scale_invariant import ScaleInvariantNetwork


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 5)).astype(np.float32))
    wins = window_partition(x, 8)
    assert wins.shape == (2 * 2 * 3, 64, 5)
    back = window_merge(wins, (16, 24), 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_matches_torch():
    import torch

    w = 8
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w),
                                        indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    want = rel.sum(-1).numpy()
    np.testing.assert_array_equal(_relative_position_index(w), want)


def test_pixel_shuffle_matches_torch(rng):
    import torch

    x = rng.standard_normal((2, 3, 4, 12)).astype(np.float32)  # NHWC, C=3*4
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    want = (
        torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want)


def test_hat_shape():
    """Reference smoke config: (2, 168, 64, 46) -> (2, 672, 256, 1) —
    scaled down here (1 group, 2 habs) for CI time; window padding path
    exercised via the non-multiple 22x45 grid."""
    model = HAT(in_channels=46, channels=32, num_groups=1, num_habs=2,
                window_size=8, num_heads=4)
    x = jnp.zeros((1, 22, 45, 46))
    v = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(v, x)
    assert y.shape == (1, 88, 180, 1)


def test_autoencoder_shape():
    m = Autoencoder(45, 1)
    x = jnp.zeros((2, 16, 20, 45))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 16, 20, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head


def test_ae_trainer_learns(rng):
    from gan_danet_tpu.data.scalers import StandardScaler

    t, h, w = 20, 8, 10
    target = rng.standard_normal((t, h, w)).astype(np.float32)
    aux = np.concatenate(
        [np.repeat(target[..., None], 3, axis=-1)
         + 0.1 * rng.standard_normal((t, h, w, 3)).astype(np.float32),
         rng.standard_normal((t, h, w, 2)).astype(np.float32)], axis=-1)
    scaler = StandardScaler().fit(target)
    trainer = AETrainer(aux, scaler.transform(target).astype(np.float32),
                        scaler, epochs=30, batch_size=5)
    losses = trainer.train()
    assert losses[-1] < losses[0]
    metrics = trainer.evaluate()
    assert metrics["cc"] > 0.3


def test_ae_scanned_epoch_matches_batch_loop(rng):
    """The scanned device-resident epoch must reproduce the per-batch
    oracle loop exactly: same permutation sequence, same batches, so
    per-epoch losses and final params agree to jit fusion noise
    (VERDICT r4 task 2)."""
    from gan_danet_tpu.data.scalers import StandardScaler

    t, h, w = 17, 8, 10          # deliberately not a batch multiple
    target = rng.standard_normal((t, h, w)).astype(np.float32)
    aux = rng.standard_normal((t, h, w, 5)).astype(np.float32)
    scaler = StandardScaler().fit(target)
    tgt = scaler.transform(target).astype(np.float32)

    a = AETrainer(aux, tgt, scaler, epochs=3, batch_size=5, seed=7)
    b = AETrainer(aux, tgt, scaler, epochs=3, batch_size=5, seed=7)
    losses_scan = a.train(scan=True)
    losses_loop = b.train(scan=False)
    np.testing.assert_allclose(losses_scan, losses_loop, rtol=1e-5,
                               atol=1e-7)
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-7)
    # scanned predict covers ALL samples incl. the wrap-padded tail
    pred = a.predict()
    assert pred.shape == (t, h, w)
    assert np.isfinite(pred).all()


def test_ae_trainer_mesh_matches_single_device(rng):
    """Data-parallel AE training over the virtual mesh equals the
    single-device run (MSE mean over the global batch is identical under
    sharding; allreduce inserted by GSPMD)."""
    from gan_danet_tpu.core.meshes import make_mesh
    from gan_danet_tpu.data.scalers import StandardScaler

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs the virtual multi-device mesh")
    t, h, w = 16, 8, 10
    target = rng.standard_normal((t, h, w)).astype(np.float32)
    aux = rng.standard_normal((t, h, w, 5)).astype(np.float32)
    scaler = StandardScaler().fit(target)
    tgt = scaler.transform(target).astype(np.float32)

    base = AETrainer(aux, tgt, scaler, epochs=2, batch_size=8, seed=3)
    mesh = make_mesh(n_ensemble=1, n_data=4)
    dp = AETrainer(aux, tgt, scaler, epochs=2, batch_size=8, seed=3,
                   mesh=mesh)
    lb = base.train()
    ld = dp.train()
    np.testing.assert_allclose(ld, lb, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(dp.predict(), base.predict(), rtol=1e-4,
                               atol=1e-5)


def test_scale_invariant_runs_at_two_resolutions():
    m = ScaleInvariantNetwork()
    x64 = jnp.zeros((1, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x64, train=False)
    y64 = m.apply(v, x64, train=False)
    y128 = m.apply(v, jnp.zeros((1, 128, 128, 1)), train=False)
    assert y64.shape == (1, 64, 64, 1)
    assert y128.shape == (1, 128, 128, 1)  # same weights, both scales


def test_hat_bfloat16_compute_path(rng):
    h32 = HAT(in_channels=8, channels=16, num_groups=1, num_habs=1,
              window_size=4, num_heads=2)
    h16 = HAT(in_channels=8, channels=16, num_groups=1, num_habs=1,
              window_size=4, num_heads=2, dtype="bfloat16")
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 8)), jnp.float32)
    variables = h32.init(jax.random.PRNGKey(0), x)
    y32 = h32.apply(variables, x)
    y16 = h16.apply(variables, x)
    assert y16.dtype == jnp.bfloat16
    assert jnp.isfinite(y16.astype(jnp.float32)).all()
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.1, atol=0.2)
