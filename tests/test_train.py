"""Training layer: schedule parity vs torch, train-step mechanics, and a
tiny end-to-end training run that must reduce the pixel loss."""
import dataclasses

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
from gan_danet_tpu.data.synthetic import tiny_config
from gan_danet_tpu.train.schedules import cosine_warm_restarts
from gan_danet_tpu.train.trainer import ModelTrainer


def test_cosine_warm_restarts_matches_torch():
    import torch

    base, t0, tmult, eta_min = 2e-4, 10, 2, 1e-6
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=tmult, eta_min=eta_min)
    ours = cosine_warm_restarts(base, steps_per_epoch=1, t_0=t0,
                                t_mult=tmult, eta_min=eta_min)
    torch_lrs, our_lrs = [], []
    for epoch in range(75):
        torch_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(float(ours(epoch)))
        sched.step()
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-9)


def test_cosine_warm_restarts_tmult1():
    ours = cosine_warm_restarts(1e-3, 1, t_0=5, t_mult=1, eta_min=0.0)
    vals = [float(ours(e)) for e in range(11)]
    assert vals[0] == pytest.approx(1e-3)
    assert vals[5] == pytest.approx(1e-3)  # restart
    assert vals[4] < vals[0] * 0.2


def _tiny_experiment(epochs=3):
    dc = tiny_config(24)
    return ExperimentConfig(
        data=dc,
        generator=GeneratorConfig(input_channels=46, num_blocks=2,
                                  num_layers_per_block=2, growth_rate=8,
                                  use_pallas_attention=False),
        discriminator=DiscriminatorConfig(input_hw=dc.grid_025),
        loss=LossConfig(use_perceptual=False),
        train=TrainConfig(epochs=epochs, batch_size=4, dtype="float32",
                          seed=42),
    )


@pytest.fixture(scope="module")
def tiny_data():
    return load_data_with_augmentation(tiny_config(24))


def test_trainer_end_to_end(tiny_data):
    cfg = _tiny_experiment(epochs=3)
    trainer = ModelTrainer(cfg, data=tiny_data)
    losses_g, losses_d = trainer.train()
    assert len(losses_g) == 3
    assert all(np.isfinite(losses_g)) and all(np.isfinite(losses_d))
    metrics = trainer.evaluate()
    assert np.isfinite(metrics["mse"])
    assert -1.0 <= metrics["cc"] <= 1.0


def test_training_reduces_eval_mse(tiny_data):
    """Training must actually fit the tiny synthetic task. (Total G loss is
    NOT monotone — the curriculum shifts weight onto the adversarial term —
    so learning is asserted on held-out pixel MSE.)"""
    cfg = _tiny_experiment(epochs=6)
    trainer = ModelTrainer(cfg, data=tiny_data)
    mse_before = trainer.evaluate()["mse"]
    trainer.train()
    mse_after = trainer.evaluate()["mse"]
    assert mse_after < mse_before


def test_early_stopping_restores_best(tiny_data):
    cfg = _tiny_experiment(epochs=2)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, early_stop_patience=1))
    trainer = ModelTrainer(cfg, data=tiny_data)
    trainer.train()
    assert trainer.best_params is not None


def test_train_step_sharded_over_mesh(tiny_data):
    """DP: batch sharded over an 8-device CPU mesh must produce the same
    losses as single-device (global BN + allreduced grads)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gan_danet_tpu.core.meshes import make_mesh

    cfg = _tiny_experiment(epochs=1)
    trainer = ModelTrainer(cfg, data=tiny_data)
    batch = next(iter(trainer.train_loader))
    batch = jax.tree.map(jnp.asarray, batch)

    state0, m_single = trainer._train_step(trainer.state, batch,
                                           jnp.float32(0.0))

    mesh = make_mesh(n_ensemble=1, n_data=4)
    sharded = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    state1, m_sharded = trainer._train_step(trainer.state, sharded,
                                            jnp.float32(0.0))
    np.testing.assert_allclose(float(m_single["loss_g"]),
                               float(m_sharded["loss_g"]), rtol=1e-3)
    np.testing.assert_allclose(float(m_single["loss_d"]),
                               float(m_sharded["loss_d"]), rtol=1e-3)


def test_model_trainer_full_train_on_mesh(tiny_data):
    """The round-3 gap lifted to a full train(): ModelTrainer(mesh=...)
    runs the whole scanned-epoch loop data-parallel (batches
    sharding-constrained over 'data', gradient allreduce + global BN
    inserted by GSPMD) and its per-epoch losses and final params match the
    single-device run — a v5e-8 accelerates the FLAGSHIP trainer, not just
    ensembles."""
    from gan_danet_tpu.core.meshes import make_mesh

    cfg = _tiny_experiment(epochs=2)
    single = ModelTrainer(cfg, data=tiny_data)
    lg_s, ld_s = single.train()

    mesh = make_mesh(n_ensemble=1, n_data=4)
    dp = ModelTrainer(cfg, data=tiny_data, mesh=mesh)
    lg_m, ld_m = dp.train()

    # Epoch 1 is a direct numeric comparison of one DP epoch vs one
    # single-device epoch: the only difference is cross-shard reduction
    # ORDER (measured ~2e-4 relative on the ensemble mesh). By epoch 2
    # the compounding adversarial updates amplify that float noise
    # (measured ~5e-3) — GAN dynamics are chaotic, so later epochs get a
    # loose band, not a tight one.
    np.testing.assert_allclose(lg_m[0], lg_s[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ld_m[0], ld_s[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(lg_m, lg_s, rtol=5e-2, atol=1e-2)
    np.testing.assert_allclose(ld_m, ld_s, rtol=5e-2, atol=1e-2)

    # the mesh-sharded prediction path equals single-device prediction of
    # the SAME trained state (eval has no reductions to reorder; comparing
    # predictions of the two independently trained states would measure
    # GAN chaos instead)
    probe = ModelTrainer(cfg, data=tiny_data)
    probe.state = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                               jax.device_get(dp.state))
    np.testing.assert_allclose(dp.predict(), probe.predict(),
                               rtol=1e-4, atol=1e-4)


def test_training_is_deterministic(tiny_data):
    """Two trainers with identical config/data/seeds must produce
    bit-identical loss histories and final params — guards the PRNG
    plumbing (init seeds, shuffle order, augmentation keys) through the
    compiled epoch scans. The reference's runs were NOT reproducible
    (cuDNN nondeterminism, SURVEY.md §7); determinism here is a
    deliberate upgrade."""
    cfg = _tiny_experiment(epochs=2)
    a, b = ModelTrainer(cfg, data=tiny_data), ModelTrainer(cfg, data=tiny_data)
    lg_a, ld_a = a.train()
    lg_b, ld_b = b.train()
    np.testing.assert_array_equal(lg_a, lg_b)
    np.testing.assert_array_equal(ld_a, ld_b)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        a.state.g_params, b.state.g_params)


def test_checkpoint_resume_continues_epochs(tiny_data, tmp_path):
    """Full-state resume: a fresh trainer restoring a mid-run checkpoint
    continues from the recorded step count (curriculum weight included),
    not from epoch 0."""
    t1 = ModelTrainer(_tiny_experiment(epochs=2), data=tiny_data)
    t1.train()                         # epochs 0..1 of an intended 4
    path = t1.save_checkpoint(str(tmp_path))

    t2 = ModelTrainer(_tiny_experiment(epochs=4), data=tiny_data)
    t2.restore_checkpoint(path)
    assert int(t2.state.step) == int(t1.state.step)
    steps_per_epoch = max(1, len(t2.train_loader))
    assert int(t2.state.step) // steps_per_epoch == 2
    lg, _ = t2.train()                 # resumes at epoch 2 -> runs 2 more
    assert len(lg) == 2
