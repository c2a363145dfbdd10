"""CLIP-style causal transformer text encoder (behavioural parity:
reference 1.encoder.ipynb — token + position embeddings, 12 pre-LN blocks
of causal MHSA (12 heads, width 768, q scaled by 0.125) and GELU-quick MLP,
final LayerNorm). Sizes are configurable; defaults match the tutorial."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — CLIP's GELU approximation (the tutorial's
    activation)."""
    return x * nn.sigmoid(1.702 * x)


class CausalSelfAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, L, D)
        b, l, d = x.shape
        hd = d // self.heads
        q = nn.Dense(d, name="q")(x) * (hd**-0.5)
        k = nn.Dense(d, name="k")(x)
        v = nn.Dense(d, name="v")(x)

        def split(t):
            return t.reshape(b, l, self.heads, hd)

        attn = jnp.einsum("blhd,bmhd->bhlm", split(q), split(k),
                          preferred_element_type=jnp.float32)
        causal = jnp.tril(jnp.ones((l, l), bool))
        attn = jnp.where(causal[None, None], attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, split(v)).reshape(b, l, d)
        return nn.Dense(d, name="out")(out)


class EncoderBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + CausalSelfAttention(self.width, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln1")(x))
        y = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        y = nn.Dense(self.width * 4, name="fc1")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, name="fc2")(y)
        return x + y


class TextEncoder(nn.Module):
    vocab_size: int = 49408
    max_length: int = 77
    width: int = 768
    heads: int = 12
    layers: int = 12

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:  # (B, L) int
        tok = nn.Embed(self.vocab_size, self.width, name="token_embed")(input_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (self.max_length, self.width))
        x = tok + pos[None, : input_ids.shape[1]]
        for i in range(self.layers):
            x = EncoderBlock(self.width, self.heads, name=f"block{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)
