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
    # per-pixel std keeps the channel axis — the reference's std over the
    # (5,N,1,H,W) member stack is (N,1,H,W) and its consumer squeezes
    # (test.ipynb:613: np.load(...).squeeze())
    pixel_std = np.load(tmp_path / "ensemble_uncertainty.npy")
    assert pixel_std.shape == (n, 1) + results["uncertainty"].shape[1:]
    np.testing.assert_allclose(pixel_std.squeeze(1), results["uncertainty"])


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
    # trues follow the same quirk, over the chronological original slice
    trues = trainer.collect_trues()
    full_std = trainer.base.original_dataset().lr_grace_025[..., None]
    np.testing.assert_allclose(
        trues, full_std * s05.scale_[0] + s05.mean_[0], rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError):
        trainer.predict_ensemble(inverse="bogus")


def test_predict_ensemble_chronological_default(ens):
    """Default full-dataset prediction runs over the ORIGINAL chronological
    unaugmented dataset — the reference's full_loader semantics
    (deep_ensemble.ipynb cell 0: full_dataset = CustomDataset(lr_grace_05o,
    lr_grace_025o, hr_auxo) from a separate load_data() call, consumed with
    shuffle=False). NOT the split-permuted augmented stack (the round-3
    deviation: 543-length, scrambled time axis)."""
    from gan_danet_tpu.data.pipeline import load_data

    trainer, raw = ens
    dc = trainer.config.data
    preds = trainer.predict_ensemble()
    # original length (24), not the augmented length (72)
    assert preds.shape[1] == dc.n_time
    assert preds.shape[1] == len(trainer.base.original_dataset())

    # time ORDER: trues must equal the unaugmented load_data output
    # (an independent pipeline run on the same raw arrays), chronologically
    ([_, _], [d25, _], _aux, _s05, _s025, _sa) = load_data(dc, raw=raw)
    trues = trainer.collect_trues(inverse=None)[..., 0]
    np.testing.assert_allclose(trues, d25, rtol=1e-6, atol=1e-6)

    # default == explicitly passing the chronological original dataset
    explicit = trainer.predict_ensemble(
        dataset=trainer.base.original_dataset())
    np.testing.assert_allclose(preds, explicit)


def test_ensemble_artifacts_chronological(ens, tmp_path):
    """The shipped ensemble_uncertainty.npy has the chronological
    (n_time, 1, H, W) layout test.ipynb:613 assumes (it zooms into a
    NetCDF with chronological time coordinates)."""
    trainer, raw = ens
    dc = trainer.config.data
    preds = trainer.predict_ensemble()
    trues = trainer.collect_trues()
    results = trainer.compute_uncertainty(preds, trues=trues,
                                          mask=raw.mask_high)
    trainer.save_artifacts(tmp_path, results)
    unc = np.load(tmp_path / "ensemble_uncertainty.npy")
    assert unc.shape == (dc.n_time, 1) + tuple(dc.grid_025)
    series = np.load(tmp_path / "ensemble_mean_predictions.npy")
    assert series.shape == (dc.n_time,)


def test_ensemble_shuffle_parity(ens):
    """The ensemble path trains with a shuffled loader by default
    (reference deep_ensemble.ipynb cell 0: DataLoader(train_dataset,
    shuffle=True); the main notebook's loader does not shuffle) and the
    batch order varies per epoch."""
    trainer, _ = ens
    assert trainer.base.train_loader.shuffle is True
    assert trainer.config.train.shuffle is True
    a = trainer.base._epoch_indices()
    b = trainer.base._epoch_indices()
    assert not np.array_equal(a, b)

    # the flagship (main-notebook) path default stays unshuffled
    from gan_danet_tpu.core.config import TrainConfig

    assert TrainConfig().shuffle is False


def test_member_epoch_indices_independent(ens):
    """Each member draws its OWN shuffled order per epoch from a
    per-member rng seeded seed+i (reference deep_ensemble.ipynb:
    set_seed(42+i) before each member's shuffled DataLoader) — orders
    differ across members AND across epochs."""
    trainer, _ = ens
    assert trainer.per_member_batches
    idx1 = trainer._member_epoch_indices()     # (nb, members, B)
    idx2 = trainer._member_epoch_indices()
    assert idx1.shape[1] == 2
    assert not np.array_equal(idx1[:, 0], idx1[:, 1])   # across members
    assert not np.array_equal(idx1, idx2)               # across epochs
    # every member's epoch still covers the whole training split
    n = len(trainer.base.train_ds)
    for m in range(2):
        assert set(idx1[:, m].ravel().tolist()) == set(range(n))


def test_per_member_stacked_step_matches_individual(ens):
    """The per-member-batch stacked composition equals running each
    member's single step on its own batch."""
    import jax.numpy as jnp

    from gan_danet_tpu.train.loops import make_stacked_step

    trainer, _ = ens
    single = trainer.base._train_step.raw
    stacked = make_stacked_step(single, per_member_batch=True)
    b0 = jax.tree.map(jnp.asarray, next(iter(trainer.base.train_loader)))
    b1 = jax.tree.map(lambda x: 1.1 * x, b0)           # a different batch
    batch = jax.tree.map(lambda a, b: jnp.stack([a, b]), b0, b1)
    lw = jnp.float32(0.3)

    _, metrics = stacked(trainer.state, batch, lw)
    for i, b in enumerate((b0, b1)):
        member = jax.tree.map(lambda x: x[i], trainer.state)
        _, m_i = single(member, b, lw)
        np.testing.assert_allclose(float(metrics["loss_g"][i]),
                                   float(m_i["loss_g"]), rtol=1e-6)
        np.testing.assert_allclose(float(metrics["loss_d"][i]),
                                   float(m_i["loss_d"]), rtol=1e-6)


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


def test_ensemble_checkpoint_resume_equals_uninterrupted(tmp_path):
    """Full-state ensemble resume (VERDICT r4 task 3): train 3 epochs
    straight vs train 1 -> checkpoint -> restore into a FRESH trainer ->
    train to 3. Final member weights (incl. the best-weights
    restore-at-end) must be identical — the checkpoint carries the
    member-stacked GANTrainState, the augmentation key, and the best
    tracker, and restore fast-forwards the shuffle rngs."""
    dc = tiny_config(24)
    raw = make_synthetic_raw(dc, seed=0)
    data = load_data_with_augmentation(dc, raw=raw)

    def make(epochs):
        cfg = ExperimentConfig(
            data=dc,
            generator=GeneratorConfig(input_channels=46, num_blocks=2,
                                      num_layers_per_block=2, growth_rate=8,
                                      use_pallas_attention=False),
            discriminator=DiscriminatorConfig(input_hw=dc.grid_025),
            loss=LossConfig(use_perceptual=False),
            train=TrainConfig(epochs=epochs, batch_size=4, dtype="float32",
                              augment=True),
        )
        return EnsembleTrainer(cfg, num_ensemble=2, data=data)

    straight = make(3)
    h_straight = straight.train_ensemble()

    # emulate preemption after epoch 0 of the 3-epoch schedule: run ONE
    # epoch of the FULL schedule (curriculum denominator = 3) by hand —
    # exactly the state a checkpoint_every=1 CLI run leaves behind
    import jax.numpy as jnp

    from gan_danet_tpu.train.loops import dataset_to_device

    interrupted = make(3)
    tc = interrupted.config.train
    interrupted._dev_train = dataset_to_device(interrupted.base.train_ds)
    lw = jnp.float32(0 / tc.epochs)
    interrupted._aug_key, ek = jax.random.split(interrupted._aug_key)
    idx = jnp.asarray(interrupted._member_epoch_indices())
    interrupted.state, gs, _ = interrupted._epoch_fn(
        interrupted.state, interrupted._dev_train, idx, lw, ek)
    avg = np.asarray(gs.mean(axis=0))
    interrupted._best_loss = np.minimum(interrupted._best_loss, avg)
    interrupted._best_params = interrupted.state.g_params
    interrupted._best_stats = interrupted.state.g_batch_stats
    path = interrupted.save_checkpoint(tmp_path / "ckpt")

    resumed = make(3)
    resumed.restore_checkpoint(path)
    h_resumed = resumed.train_ensemble()     # start_epoch derived = 1
    assert h_resumed.shape == (2, 2)         # epochs 1 and 2 only
    np.testing.assert_allclose(h_resumed, h_straight[1:], rtol=1e-5,
                               atol=1e-6)
    for a, b in zip(jax.tree.leaves(straight.state.g_params),
                    jax.tree.leaves(resumed.state.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
