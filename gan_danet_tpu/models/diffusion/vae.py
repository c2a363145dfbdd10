"""Convolutional VAE (numerical parity: reference 2.vae.ipynb — the
SD-style factor-2^(n-1) encoder/decoder built from Resnet (cell 0), Atten
(cell 1), Pad (cell 2) and the VAE topology (cell 3, :221), generalised
over a `channels` tuple so small configurations exist for GRACE rasters
and CI. Reference dims: channels (128, 256, 512, 512), latent 4, RGB).

Topology (per reference cell 3):
  encoder: conv_in -> [Resnet x2, asym-pad + VALID stride-2 conv
           (downsample on all but the last stage)] x n
           -> mid (Resnet, Atten, Resnet) -> GN/SiLU/conv to 2*latent
           -> 1x1 quant conv
  decoder: 1x1 post-quant conv -> conv_in -> mid (Resnet, Atten, Resnet)
           -> [Resnet x3, nearest-x2 + conv (upsample on all but the last
           stage)] x n -> GN/SiLU/conv out
All GroupNorms are (32 groups, eps 1e-6); the downsample is the
reference's Pad module — zero-pad one row/col at the bottom/right, then a
padding-0 stride-2 conv. Weight-compatible with the reference torch VAE
via utils/torch_port.port_diffusion_vae (parity:
tests/test_diffusion_port.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ResnetBlock(nn.Module):
    """Reference Resnet (2.vae.ipynb cell 0): GN(32, eps 1e-6)/SiLU/conv
    x2 with a 1x1 shortcut when widths change."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), epsilon=1e-6,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class SelfAttentionBlock(nn.Module):
    """Reference Atten (2.vae.ipynb cell 1): GN, single-head q/k/v/out
    Linears (with bias), C^-0.5 scaling, residual."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B,H,W,C)
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=min(32, c), epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        t = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(t)
        k = nn.Dense(c, dtype=self.dtype, name="k")(t)
        v = nn.Dense(c, dtype=self.dtype, name="v")(t)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k,
                       preferred_element_type=jnp.float32) * (c**-0.5),
            axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v)
        out = nn.Dense(c, dtype=self.dtype,
                       name="proj")(out.astype(self.dtype))
        return x + out.reshape(b, h, w, c)


def _pad_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """Reference Pad (2.vae.ipynb cell 2): zero-pad one row/col at the
    bottom/right; the following conv is stride-2 with no padding."""
    return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))


class Encoder(nn.Module):
    channels: Tuple[int, ...] = (64, 128, 256)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.channels):
            x = ResnetBlock(ch, self.dtype, name=f"down{i}_res0")(x)
            x = ResnetBlock(ch, self.dtype, name=f"down{i}_res1")(x)
            if i != len(self.channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype,
                            name=f"down{i}_conv")(_pad_downsample(x))
        x = ResnetBlock(self.channels[-1], self.dtype, name="mid_res0")(x)
        x = SelfAttentionBlock(self.dtype, name="mid_attn")(x)
        x = ResnetBlock(self.channels[-1], self.dtype, name="mid_res1")(x)
        x = nn.GroupNorm(num_groups=min(32, self.channels[-1]), epsilon=1e-6,
                         dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), dtype=self.dtype,
                    padding=((1, 1), (1, 1)), name="conv_out")(x)
        # the reference's trailing 1x1 "distribution" conv (quant_conv);
        # f32 so the latent moments (mean/logvar) leave in full precision
        return nn.Conv(2 * self.latent_channels, (1, 1),
                       name="quant_conv")(x.astype(jnp.float32))


class Decoder(nn.Module):
    channels: Tuple[int, ...] = (256, 128, 64)
    out_channels: int = 1
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        # the reference's leading 1x1 "distribution" conv (post_quant_conv)
        z = nn.Conv(self.latent_channels, (1, 1), name="post_quant_conv")(z)
        x = nn.Conv(self.channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock(self.channels[0], self.dtype, name="mid_res0")(x)
        x = SelfAttentionBlock(self.dtype, name="mid_attn")(x)
        x = ResnetBlock(self.channels[0], self.dtype, name="mid_res1")(x)
        for i, ch in enumerate(self.channels):
            x = ResnetBlock(ch, self.dtype, name=f"up{i}_res0")(x)
            x = ResnetBlock(ch, self.dtype, name=f"up{i}_res1")(x)
            x = ResnetBlock(ch, self.dtype, name=f"up{i}_res2")(x)
            if i != len(self.channels) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"up{i}_conv")(x)
        x = nn.GroupNorm(num_groups=min(32, self.channels[-1]), epsilon=1e-6,
                         dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        # f32 output head: reconstructions leave in full precision
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(x.astype(jnp.float32))


class VAE(nn.Module):
    channels: Tuple[int, ...] = (64, 128, 256)
    latent_channels: int = 4
    out_channels: int = 1
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.float32     # compute dtype; params stay f32

    def setup(self):
        self.encoder = Encoder(self.channels, self.latent_channels,
                               self.dtype)
        self.decoder = Decoder(tuple(reversed(self.channels)),
                               self.out_channels, self.latent_channels,
                               self.dtype)

    def encode(self, x: jnp.ndarray):
        """-> (mean, logvar), each (B, H/f, W/f, latent_channels).
        logvar is clipped to the stable range (the reference exponentiates
        unclipped, 2.vae.ipynb cell 3 `sample`; values never reach the
        clip bounds in practice)."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample(self, mean: jnp.ndarray, logvar: jnp.ndarray, key) -> jnp.ndarray:
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            key, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray, key) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        mean, logvar = self.encode(x)
        z = self.sample(mean, logvar, key)
        return self.decode(z), mean, logvar
