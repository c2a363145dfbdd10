"""Deep-ensemble machinery: parallel member training, prediction stack,
uncertainty stats, member checkpoint roundtrip
(reference deep_ensemble.ipynb — SURVEY.md §2.6)."""
import numpy as np
import pytest

import jax

from gan_danet_tpu.core.config import (
    DiscriminatorConfig,
    ExperimentConfig,
    GeneratorConfig,
    LossConfig,
    TrainConfig,
)
from gan_danet_tpu.data.pipeline import load_data_with_augmentation
from gan_danet_tpu.data.synthetic import make_synthetic_raw, tiny_config
from gan_danet_tpu.train.ensemble import EnsembleTrainer


@pytest.fixture(scope="module")
def ens():
    dc = tiny_config(24)
    raw = make_synthetic_raw(dc, seed=0)
    data = load_data_with_augmentation(dc, raw=raw)
    cfg = ExperimentConfig(
        data=dc,
        generator=GeneratorConfig(input_channels=46, num_blocks=2,
                                  num_layers_per_block=2, growth_rate=8,
                                  use_pallas_attention=False),
        discriminator=DiscriminatorConfig(input_hw=dc.grid_025),
        loss=LossConfig(use_perceptual=False),
        train=TrainConfig(epochs=1, batch_size=4, dtype="float32"),
    )
    trainer = EnsembleTrainer(cfg, num_ensemble=2, data=data)
    trainer.train_ensemble()
    return trainer, raw


def test_members_differ_after_training(ens):
    trainer, _ = ens
    leaf = jax.tree_util.tree_leaves(trainer.state.g_params)[0]
    assert leaf.shape[0] == 2
    # different seeds => different member weights
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))


def test_stacked_step_matches_individual_members(ens):
    """The lax.scan member composition (loops.make_stacked_step — chosen
    over vmap for TPU grouped-conv performance, 7.2x) is numerically a
    pure batching: one stacked step equals running each member's single
    step independently."""
    import jax.numpy as jnp

    from gan_danet_tpu.train.loops import make_stacked_step

    trainer, _ = ens
    single = trainer.base._train_step.raw
    stacked = make_stacked_step(single)
    batch = jax.tree.map(jnp.asarray, next(iter(trainer.base.train_loader)))
    lw = jnp.float32(0.3)

    new_states, metrics = stacked(trainer.state, batch, lw)
    for i in range(2):
        member = jax.tree.map(lambda x: x[i], trainer.state)
        ns_i, m_i = single(member, batch, lw)
        np.testing.assert_allclose(float(metrics["loss_g"][i]),
                                   float(m_i["loss_g"]), rtol=1e-6)
        np.testing.assert_allclose(float(metrics["loss_d"][i]),
                                   float(m_i["loss_d"]), rtol=1e-6)
        a = jax.tree_util.tree_leaves(
            jax.tree.map(lambda x: x[i], new_states.g_params))[0]
        b = jax.tree_util.tree_leaves(ns_i.g_params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_predict_and_uncertainty(ens):
    trainer, raw = ens
    preds = trainer.predict_ensemble()
    n = preds.shape[1]
    assert preds.shape[0] == 2 and preds.shape[-1] == 1
    results = trainer.compute_uncertainty(preds, mask=raw.mask_high)
    assert results["mean_predictions"].shape == (n, 16, 20)
    assert results["uncertainty"].shape == (n, 16, 20)
    inside = results["uncertainty"][:, raw.mask_high > 0]
    assert np.isfinite(inside).all() and (inside >= 0).all()


def test_member_checkpoint_roundtrip(ens, tmp_path):
    trainer, _ = ens
    paths = trainer.save_members(tmp_path)
    assert len(paths) == 2
    before = jax.device_get(trainer.state.g_params)
    # perturb, then restore
    trainer.state = trainer.state.replace(
        g_params=jax.tree.map(lambda x: x + 1.0, trainer.state.g_params))
    trainer.load_members(tmp_path)
    after = jax.device_get(trainer.state.g_params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 before, after)


def test_save_artifacts_layout(ens, tmp_path):
    """The reference main()'s full artifact set (deep_ensemble.ipynb
    :530-560), including ensemble_trues.npy and the duplicate
    ensemble_mean_preds.npy. main() saves compute_uncertainty's
    spatially-averaged SERIES stats for mean_predictions/mean_preds/
    uncertainty_averaged; the per-pixel std map goes to
    ensemble_uncertainty.npy (test.ipynb:613 consumer)."""
    trainer, raw = ens
    preds = trainer.predict_ensemble()
    trues = trainer.collect_trues()
    results = trainer.compute_uncertainty(preds, trues=trues,
                                          mask=raw.mask_high)
    trainer.save_artifacts(tmp_path, results)
    for f in ("ensemble_mean_predictions.npy", "ensemble_mean_preds.npy",
              "ensemble_uncertainty.npy", "ensemble_uncertainty_averaged.npy",
              "ensemble_trues.npy"):
        assert (tmp_path / f).exists(), f
    saved_trues = np.load(tmp_path / "ensemble_trues.npy")
    np.testing.assert_allclose(saved_trues, trues)
    n = preds.shape[1]
    mean_series = np.load(tmp_path / "ensemble_mean_predictions.npy")
    assert mean_series.shape == (n,)
    np.testing.assert_allclose(mean_series, results["series_mean"])
    np.testing.assert_allclose(np.load(tmp_path / "ensemble_mean_preds.npy"),
                               results["series_mean"])
    std_series = np.load(tmp_path / "ensemble_uncertainty_averaged.npy")
    assert std_series.shape == (n,)
    np.testing.assert_allclose(std_series, results["series_std"])
    pixel_std = np.load(tmp_path / "ensemble_uncertainty.npy")
    assert pixel_std.shape == results["uncertainty"].shape
    np.testing.assert_allclose(pixel_std, results["uncertainty"])


def test_predict_ensemble_scaler05_quirk(ens):
    """predict_ensemble inverse-transforms with the 0.5-degree scaler by
    default (the reference's faithful quirk, deep_ensemble.ipynb:367);
    inverse=None returns raw standardized units and inverse='scaler_025'
    the physically consistent transform."""
    trainer, _ = ens
    raw_std = trainer.predict_ensemble(inverse=None)
    quirk = trainer.predict_ensemble()                      # scaler_05
    proper = trainer.predict_ensemble(inverse="scaler_025")

    s05 = trainer.base.scaler05
    s025 = trainer.base.scaler025
    np.testing.assert_allclose(
        quirk, raw_std * s05.scale_[0] + s05.mean_[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        proper, raw_std * s025.scale_[0] + s025.mean_[0], rtol=1e-5, atol=1e-5)
    # trues follow the same quirk
    trues = trainer.collect_trues()
    full_std = np.concatenate([trainer.base.train_ds.lr_grace_025,
                               trainer.base.test_ds.lr_grace_025])[..., None]
    np.testing.assert_allclose(
        trues, full_std * s05.scale_[0] + s05.mean_[0], rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError):
        trainer.predict_ensemble(inverse="bogus")


def test_ensemble_honors_augment_flag():
    """TrainConfig.augment=True is threaded through the ensemble epoch scan
    (round-1 advisor finding: it was silently ignored)."""
    dc = tiny_config(24)
    raw = make_synthetic_raw(dc, seed=0)
    data = load_data_with_augmentation(dc, raw=raw)
    cfg = ExperimentConfig(
        data=dc,
        generator=GeneratorConfig(input_channels=46, num_blocks=2,
                                  num_layers_per_block=2, growth_rate=8,
                                  use_pallas_attention=False),
        discriminator=DiscriminatorConfig(input_hw=dc.grid_025),
        loss=LossConfig(use_perceptual=False),
        train=TrainConfig(epochs=1, batch_size=4, dtype="float32",
                          augment=True),
    )
    trainer = EnsembleTrainer(cfg, num_ensemble=2, data=data)
    history = trainer.train_ensemble()
    assert history.shape == (1, 2) and np.isfinite(history).all()
