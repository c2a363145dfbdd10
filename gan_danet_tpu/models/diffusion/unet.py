"""Conditional UNet denoiser (numerical parity: reference 3.unet.ipynb —
the SD-style UNet built from Resnet (cell 0), CrossAttention (cell 1),
Transformer (cell 2), DownBlock (cell 3), UpBlock (cell 4) and the UNet
top-level wiring (cell 5, :443), generalised over a `channels` tuple so
small configurations exist for GRACE latents and CI.

Topology (reference cell 5, channels (c0..cn)):
  conv_in -> [DownBlock_i: (res, tf) x2, stride-2 conv] x n
          -> down_res0, down_res1            (no transformer, lowest res)
          -> mid: res, tf, res
          -> up_res0..2 (skip concat, no tf) -> nearest-x2 upsample conv
          -> [UpBlock_j: (skip concat, res, tf) x3, upsample unless last] x n
          -> GroupNorm/SiLU/conv out
with skip-connections popped in reverse push order (12 pushes / 12 pops at
n=3 — the SD ladder). Weight-compatible with the reference torch modules
via utils/torch_port.port_diffusion_unet (parity:
tests/test_diffusion_port.py).

TPU-first notes: everything is static-shape under jit; attention runs as
batched einsums on the MXU with f32 accumulation; the time embedding is a
closed-form sinusoid (no table lookups).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, (B,) int -> (B, dim): freqs
    exp(-log(1e4)*k/half), concat(cos, sin) — exactly the reference's
    get_time_embed (3.unet.ipynb cell 5) at dim=320."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetTimeBlock(nn.Module):
    """Reference Resnet (3.unet.ipynb cell 0): GN(32, eps 1e-5)/SiLU/conv,
    + SiLU->Linear time projection, GN/SiLU/conv, 1x1 shortcut."""

    out_channels: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=self.eps,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = h + nn.Dense(self.out_channels, dtype=self.dtype, name="time_proj")(
            nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(32, self.out_channels),
                         epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """Reference CrossAttention (3.unet.ipynb cell 1): q/k/v bias-free,
    8-way head split, (dim/heads)^-0.5 scaling, biased out projection."""

    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        # x: (B, N, D); context: (B, L, Dc)
        b, n, d = x.shape
        hd = d // self.heads
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="k")(context)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="v")(context)

        def split(t):
            return t.reshape(b, -1, self.heads, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", split(q) * (hd**-0.5), split(k),
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, split(v)).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


class GEGLU(nn.Module):
    """Reference Transformer act stage: one projection to 2*dim_out, split
    into value and gate halves, value * GELU(gate) (exact erf GELU — torch
    nn.GELU default)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        a, g = jnp.split(y, 2, axis=-1)
        return a * nn.gelu(g, approximate=False)


class TransformerBlock(nn.Module):
    """Pre-LN self-attn, cross-attn, GEGLU MLP with residuals (the token
    core of reference Transformer, 3.unet.ipynb cell 2). torch LayerNorm
    eps is 1e-5."""

    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        x = x + CrossAttention(self.dim, self.heads, self.dtype, name="self_attn")(y, y)
        x = x + CrossAttention(self.dim, self.heads, self.dtype, name="cross_attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x), context)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln3")(x)
        y = GEGLU(self.dim * 4, self.dtype, name="geglu")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(y)
        return x + y


class SpatialTransformer(nn.Module):
    """Reference Transformer (3.unet.ipynb cell 2): GN(32, eps 1e-6) +
    1x1 conv in, one TransformerBlock over flattened tokens, 1x1 conv out,
    outer residual."""

    channels: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=min(32, c), epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, self.channels)
        y = TransformerBlock(self.channels, self.heads, self.dtype, name="block")(y, context)
        y = y.reshape(b, h, w, self.channels)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(y)
        return y + residual


class _UpsampleConv(nn.Module):
    """torch nn.Upsample(scale 2, nearest) + Conv3x3 (reference up_in and
    UpBlock.out)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class UNet(nn.Module):
    """SD-style conditional UNet, reference 3.unet.ipynb cell 5 topology
    generalised over `channels` (reference: (320, 640, 1280), context 768,
    8 heads, fourier dim 320, time dim 1280)."""

    in_channels: int = 4
    out_channels: int = 4
    channels: Tuple[int, ...] = (320, 640, 1280)
    context_dim: int = 768
    heads: int = 8
    fourier_dim: Optional[int] = None   # default: channels[0]
    time_dim: Optional[int] = None      # default: 4 * channels[0]
    dtype: jnp.dtype = jnp.float32      # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
        fd = self.fourier_dim or self.channels[0]
        td = self.time_dim or 4 * self.channels[0]
        heads = self.heads
        temb = timestep_embedding(t, fd)
        temb = nn.Dense(td, dtype=self.dtype, name="time_fc1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(td, dtype=self.dtype, name="time_fc2")(temb)

        x = nn.Conv(self.channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        skips = [x]
        # --- down: every DownBlock is (res, tf) x2 + stride-2 conv ---
        for i, ch in enumerate(self.channels):
            for k in range(2):
                x = ResnetTimeBlock(ch, dtype=self.dtype, name=f"down{i}_res{k}")(x, temb)
                x = SpatialTransformer(ch, heads, self.dtype, name=f"down{i}_tf{k}")(
                    x, context)
                skips.append(x)
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"down{i}_ds")(x)
            skips.append(x)
        ch_last = self.channels[-1]
        x = ResnetTimeBlock(ch_last, dtype=self.dtype, name="down_res0")(x, temb)
        skips.append(x)
        x = ResnetTimeBlock(ch_last, dtype=self.dtype, name="down_res1")(x, temb)
        skips.append(x)

        # --- mid ---
        x = ResnetTimeBlock(ch_last, dtype=self.dtype, name="mid_res0")(x, temb)
        x = SpatialTransformer(ch_last, heads, self.dtype, name="mid_tf")(x, context)
        x = ResnetTimeBlock(ch_last, dtype=self.dtype, name="mid_res1")(x, temb)

        # --- up: 3 plain resnets at the bottom, then UpBlocks ---
        for j in range(3):
            x = ResnetTimeBlock(ch_last, dtype=self.dtype, name=f"up_res{j}")(
                jnp.concatenate([x, skips.pop()], axis=-1), temb)
        x = _UpsampleConv(ch_last, self.dtype, name="up_in")(x)

        up_out = list(reversed(self.channels))     # UpBlock output widths
        for j, ch in enumerate(up_out):
            for k in range(3):
                x = ResnetTimeBlock(ch, dtype=self.dtype, name=f"up{j}_res{k}")(
                    jnp.concatenate([x, skips.pop()], axis=-1), temb)
                x = SpatialTransformer(ch, heads, self.dtype, name=f"up{j}_tf{k}")(
                    x, context)
            if j != len(up_out) - 1:
                x = _UpsampleConv(ch, self.dtype, name=f"up{j}_us")(x)

        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-5,
                         dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)
