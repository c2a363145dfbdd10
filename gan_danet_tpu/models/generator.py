"""The GAN-DANet generator (FlexibleUpsamplingModule) and friends.

Behavioural parity target: reference models/generator.py:175-247 —
  initial Conv3x3(in->64)-BN-ReLU;
  num_blocks=3 dense blocks (4 layers, growth 24) each followed by DANet
  attention; 1x1 transitions halving channels BETWEEN blocks
  (64 -> 160 -> 80 -> 176 -> 88 -> 184);
  upsample head = Conv-BN-ReLU + bicubic x2 + Conv-BN-ReLU + bicubic x2;
  multi-scale skip fusion: each block's post-attention features are
  bilinear-resized to the output size, 1x1-projected to 64ch and summed;
  final Conv3x3(64 -> 1).

TPU-first redesign: NHWC layout, static shapes (one compiled specialisation
per input grid), bicubic/bilinear resizes as precomputed matmul operators
(ops/resize.py), PAM via the Pallas flash kernel at large grids.
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
from flax import linen as nn

from gan_danet_tpu.core.config import GeneratorConfig
from gan_danet_tpu.models.attention import build_attention
from gan_danet_tpu.models.initializers import kaiming_conv_init
from gan_danet_tpu.ops.resize import resize2d


def resolve_dtype(name: str):
    """'float32' | 'bfloat16' -> jnp dtype. Params/BN statistics always
    stay float32 (flax param_dtype default); this only sets the compute
    dtype so convs hit the MXU at bf16 rate."""
    return jnp.bfloat16 if name in ("bfloat16", "bf16") else jnp.float32


def _bn(train: bool, name: str, dtype=jnp.float32, norm: str = "batch"):
    """Normalisation layer: 'batch' (reference semantics — per-device batch
    stats, momentum 0.9) or 'group' (8 groups; batch-size independent, no
    running stats — the config-flagged alternative from SURVEY.md §7).
    flax computes the statistics in float32 regardless of compute dtype."""
    if norm == "group":
        return nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dtype,
                            name=name)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class OriginalRelationshipLearner(nn.Module):
    """5-layer conv stack 64->1024 (reference models/generator.py:11-26).
    Vestigial in the reference training loop (the raw concat is fed
    instead) — kept for API completeness."""

    input_channels: int = 40
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate((64, 128, 256, 512, 1024)):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                        kernel_init=kaiming_conv_init, name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class DenseLayer(nn.Module):
    """BN-ReLU-Conv3x3(growth) with channel concat
    (reference models/generator.py:29-38)."""

    growth_rate: int
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        y = _bn(train, "bn", self.dtype, self.norm)(x)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=kaiming_conv_init,
                    name="conv")(y)
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = DenseLayer(self.growth_rate, self.dtype, self.norm,
                           name=f"layer{i}")(x, train)
        return x


class TransitionLayer(nn.Module):
    """BN-ReLU-Conv1x1 channel halving (reference models/generator.py:57-67)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        y = _bn(train, "bn", self.dtype, self.norm)(x)
        y = nn.relu(y)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       kernel_init=kaiming_conv_init, name="conv")(y)


class FlexibleUpsamplingModule(nn.Module):
    """The GAN-DANet generator: (B, H, W, C_in) -> (B, 4H, 4W, 1)."""

    config: GeneratorConfig = GeneratorConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        cfg = self.config
        dtype = resolve_dtype(cfg.dtype)
        x = x.astype(dtype)

        x = nn.Conv(cfg.base_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dtype, kernel_init=kaiming_conv_init,
                    name="initial_conv")(x)
        x = _bn(train, "initial_bn", dtype, cfg.norm)(x)
        x = nn.relu(x)

        num_features = cfg.base_channels
        feature_channels: List[int] = []
        skips: List[jnp.ndarray] = []
        for block_idx in range(cfg.num_blocks):
            x = DenseBlock(cfg.num_layers_per_block, cfg.growth_rate,
                           dtype, cfg.norm,
                           name=f"dense_block{block_idx}")(x, train)
            num_features += cfg.num_layers_per_block * cfg.growth_rate

            attention = build_attention(
                cfg.attention_type, num_features, cfg.pam_reduction,
                "auto" if cfg.use_pallas_attention else "xla",
                dtype=dtype, norm=cfg.norm, name=f"attention{block_idx}",
            )
            if attention is not None:
                x = attention(x, train)
            feature_channels.append(num_features)
            skips.append(x)

            if block_idx != cfg.num_blocks - 1:
                num_features //= 2
                x = TransitionLayer(num_features, dtype, cfg.norm,
                                    name=f"transition{block_idx}")(x, train)

        # upsample head: Conv-BN-ReLU, bicubic x2, Conv-BN-ReLU, bicubic x2
        h_in, w_in = x.shape[1], x.shape[2]
        x = nn.Conv(cfg.base_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dtype, kernel_init=kaiming_conv_init,
                    name="up_conv0")(x)
        x = _bn(train, "up_bn0", dtype, cfg.norm)(x)
        x = nn.relu(x)
        x = resize2d(x, (2 * h_in, 2 * w_in), "bicubic")
        x = nn.Conv(cfg.base_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dtype, kernel_init=kaiming_conv_init,
                    name="up_conv1")(x)
        x = _bn(train, "up_bn1", dtype, cfg.norm)(x)
        x = nn.relu(x)
        x = resize2d(x, (4 * h_in, 4 * w_in), "bicubic")

        # multi-scale skip fusion, deepest first (reference
        # models/generator.py:213-214, 243-245)
        out_hw = (x.shape[1], x.shape[2])
        for adjust_idx, feature in enumerate(reversed(skips)):
            resized = resize2d(feature, out_hw, "bilinear")
            x = x + nn.Conv(cfg.base_channels, (1, 1), use_bias=False,
                            dtype=dtype, kernel_init=kaiming_conv_init,
                            name=f"channel_adjust{adjust_idx}")(resized)

        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                       kernel_init=kaiming_conv_init, name="final_conv")(x)
