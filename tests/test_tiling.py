"""Tiled raster inference with halo blending (infer/tiling.py) — the
scaling path beyond the reference's whole-raster 0.05deg limit
(SURVEY.md §5 long-context row)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_danet_tpu.infer.tiling import tile_positions, tiled_apply
from gan_danet_tpu.ops.resize import resize2d


def test_tile_positions_cover_and_clamp():
    pos = tile_positions(100, 40, 8)
    assert pos[0] == 0 and pos[-1] == 60          # flush to the end
    # coverage: every index falls inside some window
    covered = np.zeros(100, bool)
    for p in pos:
        covered[p:p + 40] = True
    assert covered.all()
    assert (tile_positions(30, 40, 8) == [0]).all()


def test_tiled_constant_is_exact(rng):
    """Weight normalisation: a constant field through an upsampling
    identity-ish fn must come back constant (no seam artifacts)."""
    x = jnp.full((2, 40, 56, 3), 2.5, jnp.float32)
    fn = lambda t: resize2d(t[..., :1], (t.shape[1] * 4, t.shape[2] * 4),
                            "bilinear")
    out = tiled_apply(fn, x, (16, 16), overlap=4, upscale=4)
    assert out.shape == (2, 160, 224, 1)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-5)


def test_tiled_matches_global_outside_seam_bands(rng):
    """For a resize (locally-supported op), tiling with halo reproduces the
    global apply outside the overlap bands (inside them, each tile clamps
    taps at its own border, so values are feather-blended, not identical)."""
    from gan_danet_tpu.infer.tiling import tile_positions

    x = jnp.asarray(rng.standard_normal((1, 48, 64, 2)), jnp.float32)
    up = lambda t: resize2d(t, (t.shape[1] * 4, t.shape[2] * 4), "bilinear")
    global_out = np.asarray(up(x))
    tiled_out = np.asarray(tiled_apply(up, x, (24, 32), overlap=8, upscale=4))
    assert tiled_out.shape == global_out.shape

    s, ov = 4, 8
    def band_mask(size, tile):
        """Output pixels influenced by any INTERIOR tile border (where a
        tile clamps resize taps that the global apply does not)."""
        m = np.zeros(size * s, bool)
        for p in tile_positions(size, tile, ov):
            for border in (p, p + tile):               # left/right borders
                if 0 < border < size:                  # interior only
                    m[max(0, (border - 2) * s): (border + 2) * s] = True
        return m

    my = band_mask(48, 24)
    mx = band_mask(64, 32)
    keep = ~my[:, None] & ~mx[None, :]
    np.testing.assert_allclose(tiled_out[0][keep], global_out[0][keep],
                               rtol=2e-3, atol=2e-3)
    # inside the bands the blend stays bounded by the two tiles' range
    assert float(np.abs(tiled_out - global_out).max()) < 0.5


def test_tiled_generator_end_to_end(rng):
    """A tiny DANet generator applied tile-wise over a raster larger than
    its compiled specialisation — the actual beyond-0.05deg use case."""
    from gan_danet_tpu.core.config import GeneratorConfig
    from gan_danet_tpu.models.generator import FlexibleUpsamplingModule

    cfg = GeneratorConfig(input_channels=5, num_blocks=1,
                          num_layers_per_block=1, growth_rate=8,
                          use_pallas_attention=False)
    gen = FlexibleUpsamplingModule(cfg)
    xt = jnp.asarray(rng.standard_normal((1, 16, 16, 5)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), xt, train=False)
    fn = lambda t: gen.apply(variables, t, train=False)

    x = jnp.asarray(rng.standard_normal((1, 32, 48, 5)), jnp.float32)
    out = jax.jit(lambda x: tiled_apply(fn, x, (16, 16), overlap=4,
                                        upscale=4))(x)
    assert out.shape == (1, 128, 192, 1)
    assert bool(jnp.isfinite(out).all())


def test_tile_smaller_raster_raises():
    with pytest.raises(ValueError):
        tiled_apply(lambda t: t, jnp.zeros((1, 8, 8, 1)), (16, 16))
