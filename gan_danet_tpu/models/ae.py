"""Autoencoder regression baseline (behavioural parity: AE.ipynb cell 0):
a 3-layer conv encoder (in->64->32->16) + decoder (16->32->64->out, Tanh)
trained with plain MSE on the 45-channel aux stack -> 0.25deg TWSA (no
upscaling), plus the AETrainer driver replicating DownscaleModel
(Adam 1e-4, shuffled batches, NSE/MAE/RMSE/CC evaluation, ae_results.h5).
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
    ):
        self.hr_aux = np.asarray(hr_aux, np.float32)
        self.targets = np.asarray(grace_025, np.float32)[..., None]
        self.scaler = as_scaler_stats(scaler_025)
        self.mask = mask
        self.epochs = epochs
        self.batch_size = batch_size
        self.model = Autoencoder(hr_aux.shape[-1], 1)
        self.params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, *hr_aux.shape[1:])))["params"]
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self._rng = np.random.default_rng(seed)

        @jax.jit
        def train_step(params, opt_state, x, y):
            def loss_fn(p):
                pred = self.model.apply({"params": p}, x)
                return jnp.mean((pred - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = train_step
        self._forward = jax.jit(
            lambda params, x: self.model.apply({"params": params}, x))

    def train(self):
        n = self.hr_aux.shape[0]
        bs = self.batch_size
        losses = []
        for epoch in range(self.epochs):
            order = self._rng.permutation(n)
            total, count = 0.0, 0
            for i in range(0, n - bs + 1, bs):
                idx = order[i : i + bs]
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state,
                    jnp.asarray(self.hr_aux[idx]), jnp.asarray(self.targets[idx]))
                total += float(loss)
                count += 1
            losses.append(total / max(count, 1))
        return losses

    def predict(self) -> np.ndarray:
        """(T, H, W) physical units."""
        preds = []
        n = self.hr_aux.shape[0]
        for i in range(0, n, self.batch_size):
            x = jnp.asarray(self.hr_aux[i : i + self.batch_size])
            preds.append(np.asarray(self._forward(self.params, x))[..., 0])
        pred = np.concatenate(preds)
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
