"""Deep-ensemble machinery: parallel member training, prediction stack,
uncertainty stats, member checkpoint roundtrip
(reference deep_ensemble.ipynb — SURVEY.md §2.6)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
    trainer, raw = ens
    preds = trainer.predict_ensemble()
    results = trainer.compute_uncertainty(preds, mask=raw.mask_high)
    trainer.save_artifacts(tmp_path, results)
    for f in ("ensemble_mean_predictions.npy", "ensemble_uncertainty.npy",
              "ensemble_uncertainty_averaged.npy"):
        assert (tmp_path / f).exists(), f
