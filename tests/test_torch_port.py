"""Numerical architecture parity: the reference's OWN torch modules
(imported read-only from /root/reference) with random weights, ported into
our flax models, must produce the same forward outputs. This is the
strongest possible parity evidence (the (a==b).all() pattern the reference
itself used against HuggingFace, SURVEY.md §4.2)."""
import importlib.util

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gan_danet_tpu.core.config import GeneratorConfig
from gan_danet_tpu.models.discriminator import Discriminator1
from gan_danet_tpu.models.generator import FlexibleUpsamplingModule
from gan_danet_tpu.utils.torch_port import port_discriminator1, port_generator


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_models():
    gen = _load_ref("_ref_gen", "/root/reference/models/generator.py")
    disc = _load_ref("_ref_disc", "/root/reference/models/discriminator.py")
    return gen, disc


def test_generator_forward_parity(ref_models, rng):
    gen_mod, _ = ref_models
    torch.manual_seed(0)
    ref = gen_mod.FlexibleUpsamplingModule(input_channels=46,
                                           attention_type="danet")
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = GeneratorConfig(input_channels=46, use_pallas_attention=False)
    ours = FlexibleUpsamplingModule(cfg)
    params, stats = port_generator(sd, cfg)

    x = rng.standard_normal((2, 22, 45, 46)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    got = np.asarray(ours.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(x), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_discriminator_forward_parity(ref_models, rng):
    _, disc_mod = ref_models
    torch.manual_seed(1)
    ref = disc_mod.Discriminator1()
    ref.eval()
    x = rng.standard_normal((3, 88, 180, 1)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = port_discriminator1(sd, input_hw=(88, 180))
    ours = Discriminator1(input_hw=(88, 180))
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


@pytest.fixture(scope="module")
def ref_hat():
    """The reference HAT lives only inside HAT.ipynb cell 0 — extract the
    module source from the notebook JSON and exec it read-only (the
    __main__ demo block stays dormant under a different __name__)."""
    import json

    nb = json.loads(open("/root/reference/HAT.ipynb").read())
    src = "".join("".join(c["source"]) for c in nb["cells"]
                  if c["cell_type"] == "code")
    ns = {"__name__": "_ref_hat"}
    exec(compile(src, "HAT.ipynb", "exec"), ns)
    return ns["HAT"]


def test_hat_forward_parity(ref_hat, rng):
    """HAT torch-port parity (reference HAT.ipynb:31-260): the reference's
    own module with random weights, ported, must match our flax forward —
    window attention + rel-pos bias, channel attention, pixel shuffle,
    bilinear input residual, at a shape that exercises window padding
    (42x16: 42 % 8 != 0)."""
    from gan_danet_tpu.models.hat import HAT
    from gan_danet_tpu.utils.torch_port import port_hat

    torch.manual_seed(3)
    ref = ref_hat(in_channels=12, out_channels=1, channels=32,
                  num_groups=2, num_habs=2, window_size=8, num_heads=4,
                  upscale_factor=4).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    ours = HAT(in_channels=12, out_channels=1, channels=32, num_groups=2,
               num_habs=2, window_size=8, num_heads=4, upscale_factor=4)
    params = port_hat(sd, num_groups=2, num_habs=2, upscale_factor=4)

    x = rng.standard_normal((2, 42, 16, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 168, 64, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_generator_parity_in_train_mode(ref_models, rng):
    """Batch-stats mode too: torch train() BN uses batch statistics, as
    does our train=True path."""
    gen_mod, _ = ref_models
    torch.manual_seed(2)
    ref = gen_mod.FlexibleUpsamplingModule(input_channels=8,
                                           attention_type="danet",
                                           num_blocks=2,
                                           num_layers_per_block=2)
    ref.train()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = GeneratorConfig(input_channels=8, num_blocks=2,
                          num_layers_per_block=2,
                          use_pallas_attention=False)
    params, stats = port_generator(sd, cfg)
    ours = FlexibleUpsamplingModule(cfg)

    x = rng.standard_normal((4, 16, 20, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    got, _ = ours.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=True,
                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=5e-4)
