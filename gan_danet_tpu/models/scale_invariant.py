"""ScaleInvariantNetwork demo (behavioural parity: AE.py:12-53) — the
fully-convolutional dilated-residual net whose run-same-weights-at-two-
resolutions property justifies re-applying the trained generator at the
0.25deg -> 0.05deg scale-transfer stage.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gan_danet_tpu.models.initializers import kaiming_conv_init


class ConvBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=kaiming_conv_init, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu(x)


class AdaptiveResBlock(nn.Module):
    out_channels: int
    dilation_rate: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        d = self.dilation_rate
        residual = x
        y = nn.Conv(self.out_channels, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), kernel_init=kaiming_conv_init,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), kernel_init=kaiming_conv_init,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        return nn.relu(y + residual)


class ScaleInvariantNetwork(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = ConvBlock(64, name="entry")(x, train)
        x = AdaptiveResBlock(64, 1, name="res1")(x, train)
        x = AdaptiveResBlock(64, 2, name="res2")(x, train)
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=kaiming_conv_init, name="final_conv")(x)
