"""Torch checkpoint porting.

Users of the reference own trained `.pth` state_dicts
(model11/model12_upsampling_module.pth, best_model_member_{i}.pth,
discriminator weights). These converters map them onto this framework's
flax param/batch_stats trees so a reference deployment can switch without
retraining:

  * conv kernels: OIHW -> HWIO
  * BatchNorm: weight/bias -> scale/bias; running_mean/var -> batch_stats
  * Linear: (out, in) -> (in, out); Discriminator1's fc1 additionally needs
    its input columns permuted from the torch NCHW flatten order
    (c*H*W + h*W + w) to our NHWC order (h*W*C + w*C + c)

Numerical parity of the ported forward pass against the reference torch
modules is asserted in tests/test_torch_port.py.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from gan_danet_tpu.core.config import GeneratorConfig


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().numpy() for k, v in state.items()}


def _conv(sd, prefix, bias=True):
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def port_generator(
    state_dict: Dict[str, np.ndarray],
    config: GeneratorConfig = GeneratorConfig(),
) -> Tuple[dict, dict]:
    """Reference FlexibleUpsamplingModule state_dict -> (params,
    batch_stats) for models/generator.py. Name map follows the reference
    module layout (models/generator.py:175-228)."""
    sd = state_dict
    params: dict = {}
    stats: dict = {}

    params["initial_conv"] = _conv(sd, "initial.0", bias=False)
    params["initial_bn"], stats["initial_bn"] = _bn(sd, "initial.1")

    for b in range(config.num_blocks):
        block = {}
        block_stats = {}
        for l in range(config.num_layers_per_block):
            base = f"dense_blocks.{b}.layers.{l}"
            bn_p, bn_s = _bn(sd, f"{base}.bn")
            block[f"layer{l}"] = {"bn": bn_p, "conv": _conv(sd, f"{base}.conv")}
            block_stats[f"layer{l}"] = {"bn": bn_s}
        params[f"dense_block{b}"] = block
        stats[f"dense_block{b}"] = block_stats

        abase = f"attention_modules.{b}"
        fuse_p, fuse_s = _bn(sd, f"{abase}.fuse.1")
        params[f"attention{b}"] = {
            "position_attention": {
                "query": _conv(sd, f"{abase}.position_attention.query"),
                "key": _conv(sd, f"{abase}.position_attention.key"),
                "value": _conv(sd, f"{abase}.position_attention.value"),
                "gamma": sd[f"{abase}.position_attention.gamma"],
            },
            "channel_attention": {
                "gamma": sd[f"{abase}.channel_attention.gamma"],
            },
            "fuse_conv": _conv(sd, f"{abase}.fuse.0", bias=False),
            "fuse_bn": fuse_p,
        }
        stats[f"attention{b}"] = {"fuse_bn": fuse_s}

        if b != config.num_blocks - 1:
            tbase = f"transition_layers.{b}.layer"
            bn_p, bn_s = _bn(sd, f"{tbase}.0")
            params[f"transition{b}"] = {"bn": bn_p,
                                        "conv": _conv(sd, f"{tbase}.2")}
            stats[f"transition{b}"] = {"bn": bn_s}

    up_bn0, up_bn0_s = _bn(sd, "upsample.1")
    up_bn1, up_bn1_s = _bn(sd, "upsample.5")
    params["up_conv0"] = _conv(sd, "upsample.0", bias=False)
    params["up_bn0"] = up_bn0
    params["up_conv1"] = _conv(sd, "upsample.4", bias=False)
    params["up_bn1"] = up_bn1
    stats["up_bn0"] = up_bn0_s
    stats["up_bn1"] = up_bn1_s

    n_adjust = config.num_blocks
    for k in range(n_adjust):
        params[f"channel_adjust{k}"] = _conv(sd, f"channel_adjust.{k}",
                                             bias=False)
    params["final_conv"] = _conv(sd, "final")
    return params, stats


def _linear(sd, prefix, bias=True):
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def port_hat(
    state_dict: Dict[str, np.ndarray],
    num_groups: int = 4,
    num_habs: int = 6,
    upscale_factor: int = 4,
    has_residual_conv: bool = True,
) -> dict:
    """Reference HAT state_dict (HAT.ipynb cell 0 module layout) -> params
    for models/hat.py. Convs OIHW->HWIO, Linears transposed, LayerNorm
    weight/bias -> scale/bias, relative-position bias tables copied
    verbatim (identical Swin indexing on both sides)."""
    sd = state_dict
    params: dict = {"entry": _conv(sd, "entry"),
                    "conv_after_body": _conv(sd, "conv_after_body"),
                    "exit": _conv(sd, "exit")}
    if has_residual_conv:
        params["residual_conv"] = _conv(sd, "residual_conv")

    for g in range(num_groups):
        gbase = f"groups.{g}"
        group: dict = {"conv": _conv(sd, f"{gbase}.conv")}
        for i in range(num_habs):
            hbase = f"{gbase}.habs.{i}"
            group[f"hab{i}"] = {
                "norm1": {"scale": sd[f"{hbase}.norm1.weight"],
                          "bias": sd[f"{hbase}.norm1.bias"]},
                "norm2": {"scale": sd[f"{hbase}.norm2.weight"],
                          "bias": sd[f"{hbase}.norm2.bias"]},
                "channel_attention": {
                    "fc1": _linear(sd, f"{hbase}.channel_attention.fc.0",
                                   bias=False),
                    "fc2": _linear(sd, f"{hbase}.channel_attention.fc.2",
                                   bias=False),
                },
                "window_attention": {
                    "qkv": _linear(sd, f"{hbase}.window_attention.qkv",
                                   bias=False),
                    "proj": _linear(sd, f"{hbase}.window_attention.proj"),
                    "relative_position_bias_table":
                        sd[f"{hbase}.window_attention"
                           ".relative_position_bias_table"],
                },
            }
        params[f"group{g}"] = group

    for i in range(upscale_factor // 2):
        # torch Sequential [Conv, PixelShuffle] pairs -> even indices
        params[f"up_conv{i}"] = _conv(sd, f"upsample.{2 * i}")
    return params


def port_discriminator1(
    state_dict: Dict[str, np.ndarray],
    input_hw: Tuple[int, int] = (88, 180),
    widths: Tuple[int, ...] = (64, 128, 256, 512),
) -> dict:
    """Reference Discriminator1 state_dict -> params for
    models/discriminator.py, including the NCHW->NHWC flatten permutation
    of fc1's input columns."""
    sd = state_dict
    params: dict = {}
    for i in range(len(widths)):
        params[f"conv{i + 1}"] = _conv(sd, f"conv{i + 1}")

    # spatial size after the stride-2 stack
    h, w = input_hw
    for _ in widths:
        h = (h + 2 - 3) // 2 + 1
        w = (w + 2 - 3) // 2 + 1
    c = widths[-1]

    w1 = sd["fc1.weight"]                      # (1024, C*H*W) torch order
    idx = np.arange(c * h * w).reshape(c, h, w)
    perm = idx.transpose(1, 2, 0).reshape(-1)  # NHWC flat -> NCHW flat index
    params["fc1"] = {"kernel": w1[:, perm].T, "bias": sd["fc1.bias"]}
    params["fc2"] = {"kernel": sd["fc2.weight"].T, "bias": sd["fc2.bias"]}
    return params
