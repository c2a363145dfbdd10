"""HAT — Hybrid Attention Transformer SR baseline (behavioural parity:
reference HAT.ipynb cell 0).

Architecture: entry Conv3x3 -> num_groups x RHAG (each num_habs x HAB +
conv + residual) -> conv + global residual -> PixelShuffle x2 twice ->
exit Conv3x3, plus a bilinear-upsampled input residual (1x1-projected when
channel counts differ).

HAB = [LN -> channel attention -> residual] then [LN -> windowed MSA with
relative position bias -> residual]. The window attention (8x8 windows) is
the reference's own answer to PAM's (HW)^2 blow-up — here windows map to a
single batched MXU attention over static shapes (pad -> partition ->
attend -> merge), which XLA fuses without needing a custom kernel.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gan_danet_tpu.models.initializers import kaiming_conv_init, xavier_linear_init
from gan_danet_tpu.ops.resize import resize2d


@functools.lru_cache(maxsize=8)
def _relative_position_index(window: int) -> np.ndarray:
    """(N, N) lookup into the (2w-1)^2 bias table (standard Swin indexing)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))         # (2, w, w)
    flat = coords.reshape(2, -1)                           # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]              # (2, N, N)
    rel = rel.transpose(1, 2, 0)                           # (N, N, 2)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                     # (N, N)


class ChannelAttentionHAT(nn.Module):
    """GAP -> Dense(reduce, no bias) -> ReLU -> Dense(expand, no bias) ->
    sigmoid gate (reference HAT.ipynb ChannelAttention)."""

    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B,H,W,C)
        reduced = max(self.channels // self.reduction, 1)
        y = jnp.mean(x, axis=(1, 2))                       # (B, C)
        y = nn.Dense(reduced, use_bias=False, dtype=self.dtype,
                     kernel_init=xavier_linear_init, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                     kernel_init=xavier_linear_init, name="fc2")(y)
        return x * nn.sigmoid(y)[:, None, None, :].astype(x.dtype)


class WindowAttention(nn.Module):
    """Scaled multi-head attention inside (window x window) tokens with a
    learned relative-position bias."""

    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B_, N, C)
        b_, n, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim**-0.5

        qkv = nn.Dense(c * 3, use_bias=False, dtype=self.dtype,
                       kernel_init=xavier_linear_init, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, head_dim)
        q, k, v = (qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])  # (B_, N, h, d)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window_size))
        rel_bias = bias_table[idx.reshape(-1)].reshape(n, n, heads)
        rel_bias = jnp.transpose(rel_bias, (2, 0, 1))      # (h, N, N)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn + rel_bias[None], axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype),
                         v).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=xavier_linear_init,
                        name="proj")(out)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nh*nw, w*w, C); H, W must be multiples of w."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, w * w, c)


def window_merge(windows: jnp.ndarray, hw: Tuple[int, int], w: int) -> jnp.ndarray:
    h, wd = hw
    b = windows.shape[0] // ((h // w) * (wd // w))
    x = windows.reshape(b, h // w, wd // w, w, w, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, wd, x.shape[-1])


class HAB(nn.Module):
    channels: int
    window_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B,H,W,C)
        residual = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = ChannelAttentionHAT(self.channels, dtype=self.dtype,
                                name="channel_attention")(y)
        x = y + residual

        residual = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        b, h, wd, c = y.shape
        w = self.window_size
        pad_h = (w - h % w) % w
        pad_w = (w - wd % w) % w
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, wd + pad_w
        windows = window_partition(y, w)
        windows = WindowAttention(c, self.num_heads, w, self.dtype,
                                  name="window_attention")(windows)
        y = window_merge(windows, (hp, wp), w)
        if pad_h or pad_w:
            y = y[:, :h, :wd, :]
        return y + residual


class RHAG(nn.Module):
    channels: int
    num_habs: int
    window_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        for i in range(self.num_habs):
            x = HAB(self.channels, self.window_size, self.num_heads,
                    self.dtype, name=f"hab{i}")(x)
        x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=kaiming_conv_init,
                    name="conv")(x)
        return x + residual


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, rH, rW, C), torch channel ordering (c, rh, rw)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, h * r, w * r, c)


class HAT(nn.Module):
    """(B, H, W, C_in) -> (B, 4H, 4W, out_channels)."""

    in_channels: int = 46
    out_channels: int = 1
    channels: int = 64
    num_groups: int = 4
    num_habs: int = 6
    window_size: int = 8
    num_heads: int = 8
    upscale_factor: int = 4
    dtype: str = "float32"             # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # `train` is accepted (and ignored — HAT is LayerNorm-only, no
        # batch statistics) so HAT satisfies the uniform generator
        # interface and can drive the GAN train loop and both inference
        # pipelines, like the reference's HAT comparison runs.
        del train
        dtype = (jnp.bfloat16 if self.dtype in ("bfloat16", "bf16")
                 else jnp.float32)
        x = x.astype(dtype)
        h, w = x.shape[1], x.shape[2]
        up = self.upscale_factor
        residual = resize2d(x, (up * h, up * w), "bilinear")
        if self.in_channels != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=dtype,
                               kernel_init=kaiming_conv_init,
                               name="residual_conv")(residual)

        x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, kernel_init=kaiming_conv_init,
                    name="entry")(x)
        body_in = x
        for g in range(self.num_groups):
            x = RHAG(self.channels, self.num_habs, self.window_size,
                     self.num_heads, dtype, name=f"group{g}")(x)
        x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, kernel_init=kaiming_conv_init,
                    name="conv_after_body")(x)
        x = x + body_in

        for i in range(up // 2):
            x = nn.Conv(self.channels * 4, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=dtype, kernel_init=kaiming_conv_init,
                        name=f"up_conv{i}")(x)
            x = pixel_shuffle(x, 2)

        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, kernel_init=kaiming_conv_init,
                    name="exit")(x)
        return x + residual
