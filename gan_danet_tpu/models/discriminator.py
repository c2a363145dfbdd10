"""Discriminators (behavioural parity: reference models/discriminator.py).

Discriminator1's torch `nn.LazyLinear(1024)` binds the flatten size at the
first forward — incompatible with XLA's static-shape compilation. Here the
flatten size is derived from the configured input grid, producing one
compiled specialisation per resolution (SURVEY.md §7 guiding decisions).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from gan_danet_tpu.models.initializers import kaiming_conv_init, xavier_linear_init


def _out_hw(hw: Tuple[int, int], k: int, s: int, p: int) -> Tuple[int, int]:
    return tuple((d + 2 * p - k) // s + 1 for d in hw)


class Discriminator1(nn.Module):
    """4x stride-2 Conv3x3 (1->64->128->256->512), flatten, Dense(1024),
    Dense(1) logit, LeakyReLU(0.2) (reference models/discriminator.py:57-77)."""

    input_hw: Tuple[int, int] = (88, 180)
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    hidden: int = 1024
    leaky_slope: float = 0.2
    dtype: str = "float32"             # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B,H,W,1) -> (B,1)
        dtype = jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else jnp.float32
        x = x.astype(dtype)
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=dtype, kernel_init=kaiming_conv_init,
                        name=f"conv{i + 1}")(x)
            x = nn.leaky_relu(x, self.leaky_slope)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.hidden, dtype=dtype, kernel_init=xavier_linear_init,
                     name="fc1")(x)
        x = nn.leaky_relu(x, self.leaky_slope)
        # logits in f32 for a stable BCE
        return nn.Dense(1, kernel_init=xavier_linear_init,
                        name="fc2")(x.astype(jnp.float32))

    @staticmethod
    def flatten_dim(input_hw: Tuple[int, int], widths=(64, 128, 256, 512)) -> int:
        hw = input_hw
        for _ in widths:
            hw = _out_hw(hw, 3, 2, 1)
        return int(math.prod(hw)) * widths[-1]


class SRGAND(nn.Module):
    """SRGAN-style deep patch discriminator (reference
    models/discriminator.py:8-54). Unused by the training loop in the
    reference; kept for API parity."""

    dim: int = 64
    leaky_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)

        act = lambda y: nn.leaky_relu(y, self.leaky_slope)  # noqa: E731
        d = self.dim
        x = act(nn.Conv(d, (4, 4), (2, 2), padding=((1, 1), (1, 1)),
                        kernel_init=kaiming_conv_init, name="conv1")(x))
        for i, mult in enumerate((2, 4, 8, 16, 32), start=2):
            x = act(bn(f"bn{i - 1}")(nn.Conv(d * mult, (4, 4), (2, 2),
                                             padding=((1, 1), (1, 1)),
                                             kernel_init=kaiming_conv_init,
                                             name=f"conv{i}")(x)))
        x = act(bn("bn6")(nn.Conv(d * 16, (1, 1), kernel_init=kaiming_conv_init,
                                  name="conv7")(x)))
        x = act(bn("bn7")(nn.Conv(d * 8, (1, 1), kernel_init=kaiming_conv_init,
                                  name="conv8")(x)))
        residual = x
        x = act(bn("bn8")(nn.Conv(d * 2, (1, 1), kernel_init=kaiming_conv_init,
                                  name="conv9")(x)))
        x = act(bn("bn9")(nn.Conv(d * 2, (3, 3), padding=((1, 1), (1, 1)),
                                  kernel_init=kaiming_conv_init, name="conv10")(x)))
        x = act(bn("bn10")(nn.Conv(d * 8, (3, 3), padding=((1, 1), (1, 1)),
                                   kernel_init=kaiming_conv_init, name="conv11")(x)))
        x = x + residual
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(1, kernel_init=xavier_linear_init, name="fc")(x)
