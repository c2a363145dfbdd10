"""VGG19 feature extractor for the perceptual loss.

The reference (models/losses.py:13-73) taps torchvision VGG19 `features`
at sequential indices {1, 6, 11, 20} (relu1_1, relu2_1, relu3_1, relu4_1)
and L1-compares the taps; single-channel inputs are repeated to RGB and —
faithfully — NOT ImageNet-normalised. With no weights available it falls
back to random init with a warning; we mirror that contract
(deterministic seed) and additionally accept a torch `.pth` state_dict
via `load_torch_vgg_features` for offline weight porting (OIHW -> HWIO).
"""
from __future__ import annotations

import warnings
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision VGG19 `features` layout: channel width per conv, 'M' = maxpool.
_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


def _sequential_plan(max_index: int):
    """Yield (seq_index, kind, width) following the torch Sequential
    numbering (conv, relu alternating; pools get their own index)."""
    idx = 0
    for item in _VGG19_CFG:
        if item == "M":
            yield idx, "pool", None
            idx += 1
        else:
            yield idx, "conv", item
            idx += 1
            yield idx, "relu", None
            idx += 1
        if idx > max_index:
            return


class VGGFeatures(nn.Module):
    """Runs the VGG19 feature stack up to max(feature_layers) and returns
    the activations at the tapped indices."""

    feature_layers: Tuple[int, ...] = (1, 6, 11, 20)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        taps = {}
        max_idx = max(self.feature_layers)
        conv_i = 0
        for idx, kind, width in _sequential_plan(max_idx):
            if kind == "conv":
                x = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv{conv_i}")(x)
                conv_i += 1
            elif kind == "relu":
                x = nn.relu(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if idx in self.feature_layers:
                taps[idx] = x
            if idx == max_idx:
                break
        return taps


def init_vgg_params(
    feature_layers: Sequence[int] = (1, 6, 11, 20),
    weights_path: str = None,
    seed: int = 0,
    input_hw: Tuple[int, int] = (32, 32),
):
    """Initialise (or load) VGG feature params. Random fallback mirrors the
    reference's graceful degradation when pretrained weights can't be
    fetched (models/losses.py:42-48)."""
    module = VGGFeatures(tuple(feature_layers))
    dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
    params = jax.jit(module.init)(jax.random.PRNGKey(seed), dummy)["params"]
    if weights_path is not None:
        params = load_torch_vgg_features(weights_path, params)
    else:
        warnings.warn(
            "Using randomly initialised VGG19 features for the perceptual "
            "loss. Provide vgg_weights_path for pretrained taps.",
            RuntimeWarning,
        )
    return module, params


def load_torch_vgg_features(weights_path: str, params_template):
    """Port a torchvision VGG19 `features` state_dict (.pth) into the
    flax param tree: '<i>.weight' (OIHW) -> conv{n}/kernel (HWIO)."""
    import torch  # test/offline-port dependency only

    state = torch.load(weights_path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    # torch keys look like 'features.0.weight' or '0.weight'
    cleaned = {}
    for k, v in state.items():
        k = k.replace("features.", "")
        cleaned[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    # map sequential conv indices in order
    seq_conv_idx = [idx for idx, kind, _ in _sequential_plan(10**6) if kind == "conv"]

    new_params = dict(params_template)
    for n, seq_idx in enumerate(seq_conv_idx):
        name = f"conv{n}"
        if name not in new_params:
            break
        wk, bk = f"{seq_idx}.weight", f"{seq_idx}.bias"
        if wk not in cleaned:
            continue
        kernel = np.transpose(cleaned[wk], (2, 3, 1, 0))  # OIHW -> HWIO
        new_params[name] = {
            "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(cleaned[bk]),
        }
    return new_params
