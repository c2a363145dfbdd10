"""Conditional UNet denoiser (behavioural parity: reference 3.unet.ipynb —
SD-style down/mid/up path, sinusoidal timestep embedding through an MLP,
transformer blocks with self-attention + cross-attention on context tokens
+ GEGLU MLP). Sizes configurable; tiny defaults for GRACE latents."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, (B,) int -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetTimeBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(h)
        h = h + nn.Dense(self.out_channels, name="time_proj")(
            nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        # x: (B, N, D); context: (B, L, Dc)
        b, n, d = x.shape
        hd = d // self.heads
        q = nn.Dense(d, use_bias=False, name="q")(x)
        k = nn.Dense(d, use_bias=False, name="k")(context)
        v = nn.Dense(d, use_bias=False, name="v")(context)

        def split(t):
            return t.reshape(b, -1, self.heads, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", split(q) * (hd**-0.5), split(k),
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, split(v)).reshape(b, n, d)
        return nn.Dense(d, name="out")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.dim_out * 2, name="proj")(x)
        a, g = jnp.split(y, 2, axis=-1)
        return a * nn.gelu(g)


class TransformerBlock(nn.Module):
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(name="ln1")(x)
        x = x + CrossAttention(self.dim, self.heads, name="self_attn")(y, y)
        x = x + CrossAttention(self.dim, self.heads, name="cross_attn")(
            nn.LayerNorm(name="ln2")(x), context)
        y = nn.LayerNorm(name="ln3")(x)
        y = GEGLU(self.dim * 4, name="geglu")(y)
        y = nn.Dense(self.dim, name="mlp_out")(y)
        return x + y


class SpatialTransformer(nn.Module):
    channels: int
    heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=min(32, c), name="norm")(x)
        y = nn.Conv(self.channels, (1, 1), name="proj_in")(y)
        y = y.reshape(b, h * w, self.channels)
        y = TransformerBlock(self.channels, self.heads, name="block")(y, context)
        y = y.reshape(b, h, w, self.channels)
        y = nn.Conv(c, (1, 1), name="proj_out")(y)
        return y + residual


class UNet(nn.Module):
    in_channels: int = 4
    out_channels: int = 4
    channels: Tuple[int, ...] = (64, 128, 256)
    context_dim: int = 768
    heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
        temb = timestep_embedding(t, self.channels[0])
        temb = nn.Dense(self.channels[0] * 4, name="time_fc1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(self.channels[0] * 4, name="time_fc2")(temb)

        ctx = nn.Dense(self.channels[-1], name="context_proj")(context) \
            if context.shape[-1] != self.channels[-1] else context

        x = nn.Conv(self.channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in")(x)
        skips = [x]
        for i, ch in enumerate(self.channels):
            x = ResnetTimeBlock(ch, name=f"down{i}_res0")(x, temb)
            x = SpatialTransformer(ch, self.heads, name=f"down{i}_attn")(x, ctx)
            skips.append(x)
            if i != len(self.channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name=f"down{i}_ds")(x)
                skips.append(x)

        x = ResnetTimeBlock(self.channels[-1], name="mid_res0")(x, temb)
        x = SpatialTransformer(self.channels[-1], self.heads,
                               name="mid_attn")(x, ctx)
        x = ResnetTimeBlock(self.channels[-1], name="mid_res1")(x, temb)

        for i, ch in enumerate(reversed(self.channels)):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetTimeBlock(ch, name=f"up{i}_res0")(x, temb)
            x = SpatialTransformer(ch, self.heads, name=f"up{i}_attn")(x, ctx)
            if i != len(self.channels) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"up{i}_us")(x)
                skips.pop()  # drop the pre-downsample skip at this level

        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(x)
