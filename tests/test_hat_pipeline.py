"""HAT as a drop-in generator: adversarial training through the same GAN
loop and the full two-stage inference pipeline — the capability the
reference exercised in .ipynb_checkpoints/Test_hat-checkpoint.ipynb
(SURVEY.md §2.9) plus HAT.ipynb training."""
import numpy as np
import pytest

from gan_danet_tpu.core.config import (
    DiscriminatorConfig,
    ExperimentConfig,
    LossConfig,
    TrainConfig,
)
from gan_danet_tpu.data.pipeline import load_data_with_augmentation
from gan_danet_tpu.data.synthetic import make_synthetic_raw, tiny_config
from gan_danet_tpu.infer.downscale import predict_005, predict_025
from gan_danet_tpu.models.hat import HAT
from gan_danet_tpu.train.trainer import ModelTrainer


@pytest.fixture(scope="module")
def hat_trained():
    dc = tiny_config(24)
    raw = make_synthetic_raw(dc, seed=0)
    data = load_data_with_augmentation(dc, raw=raw)
    cfg = ExperimentConfig(
        data=dc,
        discriminator=DiscriminatorConfig(input_hw=dc.grid_025),
        loss=LossConfig(use_perceptual=False),
        train=TrainConfig(epochs=1, batch_size=4, dtype="float32"),
    )
    hat = HAT(in_channels=dc.n_aux + 1, channels=16, num_groups=1,
              num_habs=1, window_size=4, num_heads=2)
    trainer = ModelTrainer(cfg, data=data, generator=hat)
    return trainer, data, raw


def test_hat_gan_training_runs(hat_trained):
    trainer, _, _ = hat_trained
    losses_g, losses_d = trainer.train()
    assert len(losses_g) == 1
    assert np.isfinite(losses_g[0]) and np.isfinite(losses_d[0])
    # HAT is stateless: no BN batch statistics collected
    assert trainer.state.g_batch_stats == {}


def test_hat_two_stage_inference(hat_trained, tmp_path):
    trainer, data, raw = hat_trained
    fn = trainer.apply_fn()
    s1 = predict_025(fn, data, mask_high=raw.mask_high, batch_size=4,
                     export_dir=tmp_path)
    t = data[0][0].shape[0]
    assert s1.pred.shape == (t, 16, 20)
    assert -1 <= s1.pearson_r <= 1

    s2 = predict_005(fn, data, mask_high=raw.mask_high,
                     bias_high=s1.bias_high, stage1_series=s1.series_pred,
                     batch_size=2, export_dir=tmp_path)
    assert s2.pred_cm.shape == (t, 80, 100)
    assert np.isfinite(s2.series_pred_cm).all()
    assert (tmp_path / "downscaled.h5").exists()
