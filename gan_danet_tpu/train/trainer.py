"""ModelTrainer — the end-to-end training driver (behavioural parity:
GAN_DANet_train.ipynb cell 0), TPU-native.

Faithful semantics: cache-or-rebuild data; sklearn train_test_split with
the member seed; unshuffled DataLoader on the main path; AdamW(0.5, 0.999,
wd 1e-4) at lr 2e-4 (G) / 4e-4 (D); CosineAnnealingWarmRestarts(10, 2,
1e-6) stepped per epoch; curriculum adversarial weight epoch/epochs; early
stopping patience 20 on avg G loss with best-weights restore; evaluate()
reports MSE/MAE/R2/corrcoef over flattened standardized pixels.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gan_danet_tpu.core.config import ExperimentConfig, GeneratorConfig
from gan_danet_tpu.core.logger import MetricsLogger
from gan_danet_tpu.data.dataset import (
    ArrayDataset,
    Batcher,
    train_test_split_indices,
)
from gan_danet_tpu.data.pipeline import load_or_build_cache
from gan_danet_tpu.models.discriminator import Discriminator1
from gan_danet_tpu.models.generator import FlexibleUpsamplingModule
from gan_danet_tpu.models.losses import GeneratorLoss
from gan_danet_tpu.train.gan import (
    GANTrainState,
    init_gan_state,
    make_eval_step,
    make_train_step,
)
from gan_danet_tpu.train.loops import (
    batch_index_matrix,
    dataset_to_device,
    make_epoch_fn,
    make_scan_predict,
    scan_predict_to_host,
)
from gan_danet_tpu.train.schedules import cosine_warm_restarts


class ModelTrainer:
    def __init__(
        self,
        config: ExperimentConfig,
        data: Optional[Tuple] = None,
        logger: Optional[MetricsLogger] = None,
        generator=None,
        mesh=None,
    ):
        """`generator` swaps the DANet generator for any flax module with
        the uniform `__call__(x, train)` (B,H/4,W/4,C)->(B,H,W,1) interface
        — e.g. models.hat.HAT, mirroring the reference's HAT comparison
        pipeline (SURVEY.md §2.9).

        `mesh` (a core.meshes mesh with a 'data' axis) makes the flagship
        training loop data-parallel: the dataset is replicated across the
        slice and every batch in the scanned epoch is sharding-constrained
        over 'data', so GSPMD partitions the fused D+G step with gradient
        allreduce + global-BN collectives over ICI. Epoch losses match
        single-device bit-for-tolerance (tests/test_train.py). The
        reference is single-GPU (SURVEY.md §2.10) — this is the rebuild's
        scaling goal, not a parity feature."""
        self.config = config
        self.mesh = mesh
        tc = config.train
        self.logger = logger or MetricsLogger(echo=False)

        if data is None:
            data = load_or_build_cache(config.data, augmented=True)
        ([lr05, self.trend05], [lr025, self.trend25], hr_aux,
         self.scaler05, self.scaler025, self.aux_scalers) = data

        n = lr05.shape[0]
        # unsplit arrays (references, not copies): the chronological
        # original slice feeds ensemble full-dataset prediction. The
        # original length is derived from the DATA (tiled-trend
        # detection), not config.n_time — real-data ingest takes T from
        # the files, so a config mismatch must not silently mix augmented
        # samples into "original" slices
        from gan_danet_tpu.data.pipeline import infer_original_length

        self._full_arrays = (lr05, lr025, hr_aux)
        self.n_original = infer_original_length(
            np.asarray(self.trend05), config.data.augmentation_factor)
        train_idx, test_idx = train_test_split_indices(
            n, tc.test_fraction, tc.seed)
        self.train_ds = ArrayDataset(lr05[train_idx], lr025[train_idx],
                                     hr_aux[train_idx])
        self.test_ds = ArrayDataset(lr05[test_idx], lr025[test_idx],
                                    hr_aux[test_idx])
        self.train_loader = Batcher(self.train_ds, tc.batch_size,
                                    shuffle=tc.shuffle, seed=tc.seed)
        self.test_loader = Batcher(self.test_ds, tc.batch_size)

        h25, w25 = lr025.shape[1:3]
        self.coarse_hw = (h25 // 4, w25 // 4)
        n_aux = hr_aux.shape[-1]

        if generator is not None:
            self.generator = generator
        else:
            gen_cfg = config.generator
            # propagate input-channel count and the training compute dtype
            gen_cfg = GeneratorConfig(
                **{**gen_cfg.__dict__,
                   "input_channels": n_aux + 1,
                   "dtype": tc.dtype})
            self.generator = FlexibleUpsamplingModule(gen_cfg)
        self.discriminator = Discriminator1(
            input_hw=(h25, w25),
            widths=config.discriminator.widths,
            hidden=config.discriminator.hidden,
            dtype=tc.dtype,
        )

        steps_per_epoch = max(1, len(self.train_loader))
        self.g_tx = optax.adamw(
            cosine_warm_restarts(tc.lr_g, steps_per_epoch, tc.cosine_t0,
                                 tc.cosine_t_mult, tc.eta_min),
            b1=tc.adam_b1, b2=tc.adam_b2, weight_decay=tc.weight_decay,
        )
        self.d_tx = optax.adamw(
            cosine_warm_restarts(tc.lr_d, steps_per_epoch, tc.cosine_t0,
                                 tc.cosine_t_mult, tc.eta_min),
            b1=tc.adam_b1, b2=tc.adam_b2, weight_decay=tc.weight_decay,
        )

        self.g_loss = GeneratorLoss(config.loss, vgg_seed=tc.seed)
        compute_dtype = jnp.bfloat16 if tc.dtype == "bfloat16" else jnp.float32
        self._train_step = make_train_step(
            self.generator, self.discriminator, self.g_loss,
            self.g_tx, self.d_tx, self.coarse_hw, compute_dtype,
        )
        self._eval_step = make_eval_step(self.generator, self.coarse_hw,
                                         compute_dtype)

        sample = next(iter(self.train_loader))
        self.state: GANTrainState = init_gan_state(
            self.generator, self.discriminator, self.g_tx, self.d_tx,
            sample, self.coarse_hw, seed=tc.seed,
        )
        self._aug_key = jax.random.PRNGKey(tc.seed)
        self.best_params = None
        self.best_batch_stats = None

        # Device-resident epoch scan + prediction scan: the whole split
        # lives in HBM and each loop compiles to ONE program (see
        # train/loops.py for the dispatch-overhead rationale).
        self._dev_train = None
        self._dev_test = None
        self._epoch_fn = make_epoch_fn(self._train_step.raw, tc.augment,
                                       mesh=mesh)
        self._predict_fn = make_scan_predict(self._eval_step, mesh=mesh)

    # ------------------------------------------------------------------
    def original_dataset(self) -> ArrayDataset:
        """The chronological unaugmented dataset — the reference's
        `full_dataset` (deep_ensemble.ipynb cell 0: CustomDataset built
        from a SEPARATE load_data() call's lr_grace_05o/lr_grace_025o/
        hr_auxo, i.e. the original 181-month series in time order, not the
        split-permuted augmented stack). load_data_with_augmentation
        concatenates the original series FIRST (reference
        datasets.py:451-501; data/pipeline.py), so the first
        config.data.n_time samples of the unsplit arrays ARE those
        originals in time order — no second pipeline run needed."""
        lr05, lr025, aux = self._full_arrays
        n = self.n_original
        return ArrayDataset(lr05[:n], lr025[:n], aux[:n])

    # ------------------------------------------------------------------
    def _epoch_indices(self) -> np.ndarray:
        """(n_batches, batch_size) gather indices reproducing Batcher
        semantics (shuffle + wrap-around final batch)."""
        loader = self.train_loader
        n = len(loader.dataset)
        order = (loader._rng.permutation(n) if loader.shuffle
                 else np.arange(n))
        return batch_index_matrix(order, loader.batch_size)

    # ------------------------------------------------------------------
    def train(self, start_epoch: Optional[int] = None,
              checkpoint_dir: Optional[str] = None,
              checkpoint_every: int = 0):
        """Run the training loop. `start_epoch=None` resumes from the
        checkpointed step count (true mid-run resume — the curriculum
        adversarial weight continues where it left off); pass 0 to force a
        fresh run.

        checkpoint_dir + checkpoint_every=k write a full-state checkpoint
        every k epochs, so a preempted 150-epoch reference run loses at
        most k epochs. Pick k against the backend: a full-state save
        pulls params + both Adam moment sets to host (~seconds over a
        tunneled chip vs a ~1.2 s epoch), so k=1 suits co-located hosts
        and k~10 a tunnel.

        Resume granularity: `start_epoch = step // steps_per_epoch`, so a
        checkpoint taken MID-epoch resumes at that epoch's start and the
        curriculum weight w = epoch/epochs rounds DOWN one epoch for the
        replayed fraction (the reference has no resume at all —
        SURVEY.md §5; checkpoints here are written at epoch boundaries by
        the CLI, where this is exact). The best-weights tracker is NOT in
        the checkpoint payload (it restarts on resume — the first
        post-resume epoch re-seeds it; EnsembleTrainer's checkpoint does
        carry its tracker)."""
        tc = self.config.train
        if start_epoch is None:
            steps_per_epoch = max(1, len(self.train_loader))
            start_epoch = int(self.state.step) // steps_per_epoch
        losses_g, losses_d = [], []
        best_loss = float("inf")
        trigger = 0

        if self._dev_train is None:
            self._dev_train = dataset_to_device(self.train_ds, mesh=self.mesh)

        for epoch in range(start_epoch, tc.epochs):
            loss_weight = jnp.float32(epoch / tc.epochs)
            self._aug_key, ek = jax.random.split(self._aug_key)
            idx = jnp.asarray(self._epoch_indices())
            self.state, gs, ds_ = self._epoch_fn(
                self.state, self._dev_train, idx, loss_weight, ek)
            avg_g = float(gs.mean())
            avg_d = float(ds_.mean())
            losses_g.append(avg_g)
            losses_d.append(avg_d)
            self.logger.log("epoch", epoch=epoch, loss_d=avg_d, loss_g=avg_g)

            # early stopping on avg G loss (patience 20, min_delta 0).
            # Best weights stay ON DEVICE as explicit copies: the epoch
            # program donates its input state (loops.make_epoch_fn), so a
            # bare reference into self.state would be INVALIDATED by the
            # next epoch call on TPU. A device-to-device param copy per
            # improving epoch is far cheaper than the full state copy
            # per epoch that donation eliminates (device_get here cost a
            # full param pull per improving epoch)
            if avg_g < best_loss - tc.early_stop_min_delta:
                best_loss = avg_g
                trigger = 0
                self.best_params = jax.tree.map(jnp.copy,
                                                self.state.g_params)
                self.best_batch_stats = jax.tree.map(
                    jnp.copy, self.state.g_batch_stats)
            else:
                trigger += 1
                if trigger >= tc.early_stop_patience:
                    self.logger.log("early_stop", epoch=epoch)
                    self._restore_best()
                    return losses_g, losses_d

            if (checkpoint_dir is not None and checkpoint_every > 0
                    and (epoch + 1) % checkpoint_every == 0):
                self.save_checkpoint(checkpoint_dir)

        self._restore_best()
        return losses_g, losses_d

    def _restore_best(self):
        if self.best_params is not None:
            self.state = self.state.replace(
                g_params=self.best_params,
                g_batch_stats=self.best_batch_stats,
            )

    # ------------------------------------------------------------------
    def evaluate(self) -> Dict[str, float]:
        """MSE/MAE/R2/corrcoef over the test split (reference
        ModelTrainer.evaluate) — one compiled scan, no per-batch dispatch."""
        preds = self.predict()
        p = preds.reshape(-1)
        t = self.test_ds.lr_grace_025.reshape(-1)
        mse = float(np.mean((p - t) ** 2))
        mae = float(np.mean(np.abs(p - t)))
        ss_res = float(np.sum((t - p) ** 2))
        ss_tot = float(np.sum((t - t.mean()) ** 2))
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
        cc = float(np.corrcoef(t, p)[0, 1])
        self.logger.log("evaluate", mse=mse, mae=mae, r2=r2, cc=cc)
        return {"mse": mse, "mae": mae, "r2": r2, "cc": cc}

    # ------------------------------------------------------------------
    def save_checkpoint(self, directory: Optional[str] = None) -> str:
        """Full-state orbax checkpoint (params, BN stats, BOTH optimizer
        states, step) — real resume capability, unlike the reference's
        weights-only torch.save (SURVEY.md §5)."""
        from gan_danet_tpu.core.checkpoint import save_train_state

        return save_train_state(directory or self.config.train.checkpoint_dir,
                                self.state)

    def restore_checkpoint(self, path: Optional[str] = None) -> None:
        from gan_danet_tpu.core.checkpoint import (
            latest_checkpoint,
            restore_train_state,
        )

        if path is None:
            path = latest_checkpoint(self.config.train.checkpoint_dir)
            if path is None:
                raise FileNotFoundError(
                    f"no checkpoints in {self.config.train.checkpoint_dir}")
        self.state = jax.tree.map(
            jnp.asarray, restore_train_state(path, self.state))

    # ------------------------------------------------------------------
    def apply_fn(self):
        """The trained generator closed over its current variables — the
        uniform forward the inference pipelines take."""
        from gan_danet_tpu.infer.downscale import make_apply_fn

        return make_apply_fn(self.generator, self.state.g_params,
                             self.state.g_batch_stats)

    # ------------------------------------------------------------------
    def predict(self, dataset: Optional[ArrayDataset] = None,
                batch_size: Optional[int] = None) -> np.ndarray:
        """Forward the (coarsened-input) pipeline over a dataset (default:
        the test split) as ONE device-resident scan; returns stacked
        standardized-detrended predictions in sample order."""
        ds = dataset if dataset is not None else self.test_ds
        if dataset is None:
            if self._dev_test is None:
                self._dev_test = dataset_to_device(ds, mesh=self.mesh)
            data = self._dev_test
        else:
            data = dataset_to_device(ds, mesh=self.mesh)
        return scan_predict_to_host(
            self._predict_fn, self.state.g_params, self.state.g_batch_stats,
            data, np.arange(len(ds)),
            batch_size or self.config.train.batch_size)
