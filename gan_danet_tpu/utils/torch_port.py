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


def _norm(sd, prefix):
    """torch GroupNorm/LayerNorm weight/bias -> flax scale/bias."""
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def port_text_encoder(state_dict: Dict[str, np.ndarray],
                      layers: int = 12) -> dict:
    """Reference CLIP text encoder state_dict (the torch Sequential built
    in 1.encoder.ipynb cell 3: Embed, N x ClipEncoder, LayerNorm) ->
    params for models/diffusion/text_encoder.TextEncoder."""
    sd = state_dict
    params: dict = {
        "token_embed": {"embedding": sd["0.embed.weight"]},
        "pos_embed": sd["0.pos_embed.weight"],
    }
    for i in range(layers):
        t = i + 1
        params[f"block{i}"] = {
            "ln1": _norm(sd, f"{t}.s1.0"),
            "attn": {
                "q": _linear(sd, f"{t}.s1.1.q"),
                "k": _linear(sd, f"{t}.s1.1.k"),
                "v": _linear(sd, f"{t}.s1.1.v"),
                "out": _linear(sd, f"{t}.s1.1.out"),
            },
            "ln2": _norm(sd, f"{t}.s2.0"),
            "fc1": _linear(sd, f"{t}.s2.1"),
            "fc2": _linear(sd, f"{t}.s3"),
        }
    params["final_ln"] = _norm(sd, f"{layers + 1}")
    return params


def _vae_resnet(sd, prefix):
    """Reference 2.vae.ipynb Resnet (s: GN,SiLU,conv,GN,SiLU,conv + res)."""
    out = {"norm1": _norm(sd, f"{prefix}.s.0"),
           "conv1": _conv(sd, f"{prefix}.s.2"),
           "norm2": _norm(sd, f"{prefix}.s.3"),
           "conv2": _conv(sd, f"{prefix}.s.5")}
    if f"{prefix}.res.weight" in sd:
        out["shortcut"] = _conv(sd, f"{prefix}.res")
    return out


def _vae_atten(sd, prefix):
    """Reference 2.vae.ipynb Atten (norm + single-head q/k/v/out)."""
    return {"norm": _norm(sd, f"{prefix}.norm"),
            "q": _linear(sd, f"{prefix}.q"),
            "k": _linear(sd, f"{prefix}.k"),
            "v": _linear(sd, f"{prefix}.v"),
            "proj": _linear(sd, f"{prefix}.out")}


def port_diffusion_vae(state_dict: Dict[str, np.ndarray],
                       n_stages: int) -> dict:
    """Reference VAE state_dict (2.vae.ipynb cell 3 Sequential layout;
    n_stages = len(channels), reference 4) -> params for
    models/diffusion/vae.VAE."""
    sd = state_dict
    n = n_stages
    enc: dict = {"conv_in": _conv(sd, "encoder.0")}
    for i in range(n):
        s = i + 1
        enc[f"down{i}_res0"] = _vae_resnet(sd, f"encoder.{s}.0")
        enc[f"down{i}_res1"] = _vae_resnet(sd, f"encoder.{s}.1")
        if i != n - 1:
            enc[f"down{i}_conv"] = _conv(sd, f"encoder.{s}.2.1")
    enc["mid_res0"] = _vae_resnet(sd, f"encoder.{n + 1}.0")
    enc["mid_attn"] = _vae_atten(sd, f"encoder.{n + 1}.1")
    enc["mid_res1"] = _vae_resnet(sd, f"encoder.{n + 1}.2")
    enc["norm_out"] = _norm(sd, f"encoder.{n + 2}.0")
    enc["conv_out"] = _conv(sd, f"encoder.{n + 2}.2")
    enc["quant_conv"] = _conv(sd, f"encoder.{n + 3}")

    dec: dict = {"post_quant_conv": _conv(sd, "decoder.0"),
                 "conv_in": _conv(sd, "decoder.1"),
                 "mid_res0": _vae_resnet(sd, "decoder.2.0"),
                 "mid_attn": _vae_atten(sd, "decoder.2.1"),
                 "mid_res1": _vae_resnet(sd, "decoder.2.2")}
    for i in range(n):
        s = i + 3
        for k in range(3):
            dec[f"up{i}_res{k}"] = _vae_resnet(sd, f"decoder.{s}.{k}")
        if i != n - 1:
            dec[f"up{i}_conv"] = _conv(sd, f"decoder.{s}.4")
    dec["norm_out"] = _norm(sd, f"decoder.{n + 3}.0")
    dec["conv_out"] = _conv(sd, f"decoder.{n + 3}.2")
    return {"encoder": enc, "decoder": dec}


def _unet_resnet(sd, prefix):
    """Reference 3.unet.ipynb Resnet (time MLP + s0/s1 GN,SiLU,conv)."""
    out = {"time_proj": _linear(sd, f"{prefix}.time.1"),
           "norm1": _norm(sd, f"{prefix}.s0.0"),
           "conv1": _conv(sd, f"{prefix}.s0.2"),
           "norm2": _norm(sd, f"{prefix}.s1.0"),
           "conv2": _conv(sd, f"{prefix}.s1.2")}
    if f"{prefix}.res.weight" in sd:
        out["shortcut"] = _conv(sd, f"{prefix}.res")
    return out


def _unet_cross_attn(sd, prefix):
    return {"q": _linear(sd, f"{prefix}.q", bias=False),
            "k": _linear(sd, f"{prefix}.k", bias=False),
            "v": _linear(sd, f"{prefix}.v", bias=False),
            "out": _linear(sd, f"{prefix}.out")}


def _unet_transformer(sd, prefix):
    """Reference 3.unet.ipynb Transformer -> flax SpatialTransformer."""
    return {
        "norm": _norm(sd, f"{prefix}.norm_in"),
        "proj_in": _conv(sd, f"{prefix}.cnn_in"),
        "block": {
            "ln1": _norm(sd, f"{prefix}.norm_atten0"),
            "self_attn": _unet_cross_attn(sd, f"{prefix}.atten1"),
            "ln2": _norm(sd, f"{prefix}.norm_atten1"),
            "cross_attn": _unet_cross_attn(sd, f"{prefix}.atten2"),
            "ln3": _norm(sd, f"{prefix}.norm_act"),
            "geglu": {"proj": _linear(sd, f"{prefix}.fc0")},
            "mlp_out": _linear(sd, f"{prefix}.fc1"),
        },
        "proj_out": _conv(sd, f"{prefix}.cnn_out"),
    }


def port_diffusion_unet(state_dict: Dict[str, np.ndarray],
                        n_levels: int = 3) -> dict:
    """Reference UNet state_dict (3.unet.ipynb cell 5 attribute layout;
    n_levels = len(channels), reference 3) -> params for
    models/diffusion/unet.UNet."""
    sd = state_dict
    params: dict = {
        "conv_in": _conv(sd, "in_vae"),
        "time_fc1": _linear(sd, "in_time.0"),
        "time_fc2": _linear(sd, "in_time.2"),
    }
    for i in range(n_levels):
        base = f"down_block{i}"
        for k in range(2):
            params[f"down{i}_res{k}"] = _unet_resnet(sd, f"{base}.res{k}")
            params[f"down{i}_tf{k}"] = _unet_transformer(sd, f"{base}.tf{k}")
        params[f"down{i}_ds"] = _conv(sd, f"{base}.out")
    params["down_res0"] = _unet_resnet(sd, "down_res0")
    params["down_res1"] = _unet_resnet(sd, "down_res1")
    params["mid_res0"] = _unet_resnet(sd, "mid_res0")
    params["mid_tf"] = _unet_transformer(sd, "mid_tf")
    params["mid_res1"] = _unet_resnet(sd, "mid_res1")
    for j in range(3):
        params[f"up_res{j}"] = _unet_resnet(sd, f"up_res{j}")
    params["up_in"] = {"conv": _conv(sd, "up_in.1")}
    for j in range(n_levels):
        base = f"up_block{j}"
        for k in range(3):
            params[f"up{j}_res{k}"] = _unet_resnet(sd, f"{base}.res{k}")
            params[f"up{j}_tf{k}"] = _unet_transformer(sd, f"{base}.tf{k}")
        if j != n_levels - 1:
            params[f"up{j}_us"] = {"conv": _conv(sd, f"{base}.out.1")}
    params["norm_out"] = _norm(sd, "out.0")
    params["conv_out"] = _conv(sd, "out.2")
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
