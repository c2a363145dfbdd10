"""Loss functions (behavioural parity: reference models/losses.py and the
loss composition in GAN_DANet_train.ipynb cell 0).

All losses are pure functions over NHWC arrays, closed over any frozen
params (VGG taps), so the whole G/D loss graph stays inside one jitted
train step.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from gan_danet_tpu.core.config import LossConfig
from gan_danet_tpu.models.vgg import init_vgg_params
from gan_danet_tpu.ops.ssim import ssim
from gan_danet_tpu.ops.tv import tv_loss


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    # numerically stable: max(x,0) - x*t + log(1 + exp(-|x|))
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(loss)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def make_perceptual_loss(
    feature_layers: Sequence[int] = (1, 6, 11, 20),
    weights_path: Optional[str] = None,
    seed: int = 0,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """VGG19 perceptual loss: L1 distance at each tapped layer, summed.
    Single-channel inputs are repeated to RGB (no ImageNet normalisation —
    faithful to reference models/losses.py:63-73)."""
    module, params = init_vgg_params(feature_layers, weights_path, seed)

    def loss_fn(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        if y.shape[-1] == 1:
            y = jnp.tile(y, (1, 1, 1, 3))
        tx = module.apply({"params": params}, x.astype(jnp.float32))
        ty = module.apply({"params": params}, y.astype(jnp.float32))
        total = jnp.float32(0.0)
        for idx in sorted(tx.keys()):
            total = total + jnp.mean(jnp.abs(tx[idx] - ty[idx]))
        return total

    return loss_fn


class GeneratorLoss:
    """loss_G = (1-w)*MSE + w*adv + TV + perceptual  [+ optional (1-SSIM)]
    with curriculum weight w = epoch/epochs (reference
    GAN_DANet_train.ipynb cell 0). SSIM is computed-but-unused in the
    reference — off by default, wired behind LossConfig.use_ssim."""

    def __init__(self, config: LossConfig = LossConfig(), vgg_seed: int = 0):
        self.config = config
        self.perceptual = (
            make_perceptual_loss(config.perceptual_layers,
                                 config.vgg_weights_path, vgg_seed)
            if config.use_perceptual
            else None
        )

    def __call__(
        self,
        fake_logits: jnp.ndarray,
        generated: jnp.ndarray,
        target: jnp.ndarray,
        loss_weight: jnp.ndarray,
    ):
        adv = bce_with_logits(fake_logits, jnp.ones_like(fake_logits))
        pixel = mse(generated, target)
        tv = tv_loss(generated, self.config.tv_weight)
        total = (1.0 - loss_weight) * pixel + loss_weight * adv + tv
        aux = {"adv": adv, "pixel": pixel, "tv": tv}
        if self.perceptual is not None:
            perc = self.perceptual(generated, target)
            total = total + perc
            aux["perceptual"] = perc
        if self.config.use_ssim:
            s = 1.0 - ssim(generated, target, self.config.ssim_window)
            total = total + s
            aux["ssim"] = s
        return total, aux


def discriminator_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray):
    """Mean of BCE(real, 1) and BCE(fake, 0) (reference D step)."""
    loss_real = bce_with_logits(real_logits, jnp.ones_like(real_logits))
    loss_fake = bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))
    return 0.5 * (loss_real + loss_fake)
