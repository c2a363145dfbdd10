"""VGG19 torch-weight porting path (models/vgg.py:load_torch_vgg_features).

The reference trains its perceptual loss on pretrained torchvision VGG19
features (/root/reference/models/losses.py:13-73). No pretrained weights
ship in this image, so we validate the port with a randomly initialised
torch VGG19 `features` stack: save its state_dict, port it, and assert the
tapped activations match a torch forward exactly.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gan_danet_tpu.models.vgg import (  # noqa: E402
    VGGFeatures,
    init_vgg_params,
    load_torch_vgg_features,
)

TAPS = (1, 6, 11, 20)


def _torch_vgg19_features(max_index: int):
    """torchvision-layout VGG19 `features` Sequential up to max_index,
    built locally (torchvision's weights aren't needed, just the layout)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for item in cfg:
        if item == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, item, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_ch = item
        if len(layers) > max_index:
            break
    return torch.nn.Sequential(*layers[: max_index + 1])


def test_torch_state_dict_roundtrip(tmp_path):
    torch.manual_seed(0)
    tvgg = _torch_vgg19_features(max(TAPS)).eval()
    path = tmp_path / "vgg19_features.pth"
    torch.save(tvgg.state_dict(), path)

    module = VGGFeatures(TAPS)
    template = module.init(
        __import__("jax").random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 3), jnp.float32))["params"]
    params = load_torch_vgg_features(str(path), template)

    x = np.random.default_rng(0).standard_normal((2, 16, 16, 3)).astype(
        np.float32)
    taps_jax = module.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        acts, cur = {}, t
        for i, layer in enumerate(tvgg):
            cur = layer(cur)
            if i in TAPS:
                acts[i] = cur.numpy()

    for i in TAPS:
        got = np.transpose(np.asarray(taps_jax[i]), (0, 3, 1, 2))
        np.testing.assert_allclose(got, acts[i], rtol=1e-4, atol=1e-5)


def test_features_prefix_keys_accepted(tmp_path):
    """Full-model state_dicts prefix keys with 'features.'; the loader
    strips it."""
    torch.manual_seed(1)
    tvgg = _torch_vgg19_features(max(TAPS))
    state = {f"features.{k}": v for k, v in tvgg.state_dict().items()}
    path = tmp_path / "vgg19_full.pth"
    torch.save(state, path)
    module, params = init_vgg_params(TAPS, weights_path=str(path))
    first = np.asarray(params["conv0"]["kernel"])
    want = tvgg[0].weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(first, want, rtol=1e-6)


def test_random_fallback_warns():
    with pytest.warns(RuntimeWarning, match="randomly initialised VGG19"):
        init_vgg_params(TAPS, weights_path=None)
