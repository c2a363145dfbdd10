"""Attention modules: PAM, CAM, DANet fusion, SE, CBAM.

Behavioural parity targets (reference models/generator.py:70-172), rebuilt
as NHWC flax modules whose hot paths dispatch to the fused ops in
gan_danet_tpu/ops (Pallas flash PAM on TPU, blocked XLA elsewhere).
"""
from __future__ import annotations

import warnings
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gan_danet_tpu.models.initializers import kaiming_conv_init
from gan_danet_tpu.ops.attention import cam_attention, pam_attention


class PAMModule(nn.Module):
    """Position attention (reference models/generator.py:104-122):
    1x1 convs to C/8 for q/k and C for v; unscaled softmax(QK^T)V over the
    flattened spatial axis; learned residual scale gamma (init 0)."""

    channels: int
    reduction: int = 8
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B,H,W,C)
        b, h, w, c = x.shape
        reduced = max(1, self.channels // self.reduction)
        q = nn.Conv(reduced, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming_conv_init, name="query")(x)
        k = nn.Conv(reduced, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming_conv_init, name="key")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming_conv_init, name="value")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))

        n = h * w
        out = pam_attention(
            q.reshape(b, n, reduced), k.reshape(b, n, reduced), v.reshape(b, n, c),
            impl=self.impl,
        ).reshape(b, h, w, c)
        return gamma.astype(out.dtype) * out + x


class CAMModule(nn.Module):
    """Channel attention with the inverted-similarity max trick
    (reference models/generator.py:125-139); gamma residual init 0."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        out = cam_attention(x.reshape(b, h * w, c)).reshape(b, h, w, c)
        return gamma.astype(out.dtype) * out + x


class DANetAttention(nn.Module):
    """PAM || CAM, concat, fuse via Conv3x3(no bias)-BN-ReLU
    (reference models/generator.py:142-157)."""

    channels: int
    pam_reduction: int = 8
    pam_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        position = PAMModule(self.channels, self.pam_reduction, self.pam_impl,
                             self.dtype, name="position_attention")(x)
        channel = CAMModule(self.channels, name="channel_attention")(x)
        y = jnp.concatenate([position, channel], axis=-1)
        y = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_conv_init,
                    name="fuse_conv")(y)
        if self.norm == "group":
            y = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                             name="fuse_bn")(y)
        else:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="fuse_bn")(y)
        return nn.relu(y)


class SqueezeExcitation(nn.Module):
    """SE channel gate (reference models/generator.py:70-84)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        reduced = max(1, self.channels // self.reduction)
        attn = jnp.mean(x, axis=(1, 2), keepdims=True)
        attn = nn.Conv(reduced, (1, 1), kernel_init=kaiming_conv_init, name="fc1")(attn)
        attn = nn.relu(attn)
        attn = nn.Conv(self.channels, (1, 1), kernel_init=kaiming_conv_init, name="fc2")(attn)
        return x * nn.sigmoid(attn)


class CBAMBlock(nn.Module):
    """SE + 7x7 spatial attention over [max, mean] channel maps
    (reference models/generator.py:87-101)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = SqueezeExcitation(self.channels, self.reduction, name="channel_attention")(x)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        attn = nn.Conv(1, (7, 7), padding=((3, 3), (3, 3)), use_bias=False,
                       kernel_init=kaiming_conv_init, name="spatial_conv")(
            jnp.concatenate([max_out, avg_out], axis=-1)
        )
        return x * nn.sigmoid(attn)


def build_attention(
    attention_type: Optional[str],
    channels: int,
    pam_reduction: int = 8,
    pam_impl: str = "auto",
    dtype: jnp.dtype = jnp.float32,
    norm: str = "batch",
    name: Optional[str] = None,
):
    """Map attention-type string to a module. 'senet' and 'cbam' alias to
    DANet with a warning — faithful to the reference's behaviour
    (models/generator.py:160-172; every reference notebook passes 'senet'),
    minus its missing-`warnings`-import crash."""
    if attention_type is None or attention_type.lower() == "none":
        return None
    attention = attention_type.lower()
    if attention in ("danet", "senet", "cbam"):
        if attention != "danet":
            warnings.warn(
                f"Attention type '{attention_type}' currently aliases to 'danet'.",
                RuntimeWarning,
            )
        return DANetAttention(channels, pam_reduction, pam_impl, dtype,
                              norm, name=name)
    raise ValueError(f"Unsupported attention type: {attention_type}")
