"""Model shape/behaviour tests (the reference's only 'tests' were notebook
shape smokes — SURVEY.md §4.1; these formalise them)."""
import chex
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_danet_tpu.core.config import DiscriminatorConfig, GeneratorConfig
from gan_danet_tpu.models.attention import (
    CAMModule,
    CBAMBlock,
    DANetAttention,
    PAMModule,
    SqueezeExcitation,
    build_attention,
)
from gan_danet_tpu.models.discriminator import Discriminator1, SRGAND
from gan_danet_tpu.models.generator import (
    FlexibleUpsamplingModule,
    OriginalRelationshipLearner,
)


def test_generator_train_shape():
    """Train path: (B, 22, 45, 46) -> (B, 88, 180, 1) (x4 upsample)."""
    cfg = GeneratorConfig(input_channels=46, use_pallas_attention=False)
    model = FlexibleUpsamplingModule(cfg)
    x = jnp.zeros((2, 22, 45, 46))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 88, 180, 1)


def test_generator_channel_progression():
    """Dense/transition channel schedule 64->160->80->176->88->184
    (reference models/generator.py:199-211)."""
    cfg = GeneratorConfig(input_channels=46, use_pallas_attention=False)
    model = FlexibleUpsamplingModule(cfg)
    x = jnp.zeros((1, 8, 10, 46))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    p = variables["params"]
    assert p["transition0"]["conv"]["kernel"].shape[-2:] == (160, 80)
    assert p["transition1"]["conv"]["kernel"].shape[-2:] == (176, 88)
    # final attention block fuses 2*184 -> 184
    assert p["attention2"]["fuse_conv"]["kernel"].shape[-2:] == (368, 184)


def test_generator_gamma_zero_init_matches_no_attention_at_init():
    """PAM/CAM gamma init to 0 => at init attention residuals are identity
    (reference nn.Parameter(torch.zeros(1)))."""
    cfg = GeneratorConfig(input_channels=4, use_pallas_attention=False)
    model = FlexibleUpsamplingModule(cfg)
    x = jnp.ones((1, 8, 10, 4))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    g = variables["params"]["attention0"]["position_attention"]["gamma"]
    assert float(g[0]) == 0.0


def test_training_mode_updates_batch_stats():
    cfg = GeneratorConfig(input_channels=4, use_pallas_attention=False)
    model = FlexibleUpsamplingModule(cfg)
    x = jnp.ones((2, 8, 10, 4))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    y, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert y.shape == (2, 32, 40, 1)


def test_discriminator_shapes():
    d = Discriminator1(input_hw=(88, 180))
    x = jnp.zeros((3, 88, 180, 1))
    variables = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(variables, x)
    assert y.shape == (3, 1)
    # static flatten dim replaces torch LazyLinear: 512 * 6 * 12
    assert variables["params"]["fc1"]["kernel"].shape == (
        Discriminator1.flatten_dim((88, 180)), 1024)
    assert Discriminator1.flatten_dim((88, 180)) == 512 * 6 * 12


def test_srgand_shape():
    d = SRGAND(dim=8)
    x = jnp.zeros((2, 128, 128, 1))
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    y = d.apply(variables, x, train=False)
    assert y.shape == (2, 1)


def test_relationship_learner_shape():
    m = OriginalRelationshipLearner(40)
    x = jnp.zeros((1, 10, 10, 40))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 10, 10, 1024)


@pytest.mark.parametrize("cls", [SqueezeExcitation, CBAMBlock, CAMModule])
def test_attention_modules_preserve_shape(cls):
    m = cls(16)
    x = jnp.ones((2, 8, 10, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape


def test_pam_module_shape():
    m = PAMModule(16, impl="xla")
    x = jnp.ones((2, 8, 10, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape


def test_danet_attention_shape():
    m = DANetAttention(16, pam_impl="xla")
    x = jnp.ones((2, 8, 10, 16))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == x.shape


def test_senet_aliases_to_danet_with_warning():
    with pytest.warns(RuntimeWarning):
        mod = build_attention("senet", 16)
    assert isinstance(mod, DANetAttention)
    assert build_attention("none", 16) is None
    with pytest.raises(ValueError):
        build_attention("nonsense", 16)


def test_generator_bfloat16_compute_path(rng):
    """bf16 compute dtype: params stay f32, outputs finite and close to
    the f32 forward (MXU-rate path used by the benchmark/trainer)."""
    import dataclasses

    from gan_danet_tpu.core.config import GeneratorConfig
    from gan_danet_tpu.models.generator import FlexibleUpsamplingModule

    cfg32 = GeneratorConfig(input_channels=8, num_blocks=2,
                            num_layers_per_block=2, growth_rate=8,
                            use_pallas_attention=False)
    cfg16 = dataclasses.replace(cfg32, dtype="bfloat16")
    g32 = FlexibleUpsamplingModule(cfg32)
    g16 = FlexibleUpsamplingModule(cfg16)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 8)), jnp.float32)
    variables = g32.init(jax.random.PRNGKey(0), x, train=False)
    # params are compute-dtype independent
    chex.assert_trees_all_equal_shapes(
        variables["params"],
        g16.init(jax.random.PRNGKey(0), x, train=False)["params"])
    y32 = g32.apply(variables, x, train=False)
    y16 = g16.apply(variables, x, train=False)
    assert y16.dtype == jnp.bfloat16
    assert jnp.isfinite(y16.astype(jnp.float32)).all()
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.1, atol=0.15)
    p32 = jax.tree_util.tree_leaves(variables["params"])[0]
    assert p32.dtype == jnp.float32


def test_generator_groupnorm_option(rng):
    """norm='group': batch-size-independent normalisation, no BN running
    stats collected (SURVEY.md §7 config-flagged alternative)."""
    from gan_danet_tpu.core.config import GeneratorConfig
    from gan_danet_tpu.models.generator import FlexibleUpsamplingModule

    cfg = GeneratorConfig(input_channels=8, num_blocks=2,
                          num_layers_per_block=2, growth_rate=8,
                          use_pallas_attention=False, norm="group")
    g = FlexibleUpsamplingModule(cfg)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 8)), jnp.float32)
    variables = g.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" not in variables
    y = g.apply(variables, x, train=True)
    assert y.shape == (2, 32, 40, 1)
    # group norm output is identical in train and eval mode
    y2 = g.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)
