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


def test_tile_local_attention_error_band(rng):
    """PAM/CAM are GLOBAL operators; under tiling their receptive field
    silently shrinks to the tile (round-2 verdict missing #6). This pins
    the approximation's two error sources separately on a smooth
    GRACE-like field (module docstring numbers):

      * attention OFF (gamma=0): pure conv-path seam error — small and
        improved by overlap;
      * attention ON (gamma=0.5): receptive-field error dominates —
        bounded, and NOT fixed by overlap (it is not a seam artifact).
    """
    from scipy.ndimage import gaussian_filter

    from gan_danet_tpu.core.config import GeneratorConfig
    from gan_danet_tpu.models.generator import FlexibleUpsamplingModule

    cfg = GeneratorConfig(input_channels=5, num_blocks=2,
                          num_layers_per_block=2, growth_rate=8,
                          use_pallas_attention=False)
    gen = FlexibleUpsamplingModule(cfg)
    xt = jnp.asarray(rng.standard_normal((1, 16, 16, 5)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), xt, train=False)

    def with_gamma(val):
        def walk(d):
            return {k: (walk(v) if isinstance(v, dict)
                        else (jnp.full_like(v, val) if k == "gamma" else v))
                    for k, v in d.items()}

        return {"params": walk(variables["params"]),
                "batch_stats": variables["batch_stats"]}

    raw = rng.standard_normal((1, 32, 48, 5)).astype(np.float32)
    smooth = gaussian_filter(raw, sigma=(0, 3, 3, 0)).astype(np.float32)
    x = jnp.asarray(smooth / smooth.std())

    def rel_rms(gamma, overlap):
        v = with_gamma(gamma)
        fn = lambda t: gen.apply(v, t, train=False)  # noqa: E731
        whole = np.asarray(fn(x))
        tiled = np.asarray(tiled_apply(fn, x, (16, 16), overlap=overlap,
                                       upscale=4))
        return (float(np.sqrt(((tiled - whole) ** 2).mean()))
                / float(np.sqrt((whole ** 2).mean())))

    # conv-only seam error: small, and overlap helps
    seam4, seam8 = rel_rms(0.0, 4), rel_rms(0.0, 8)
    assert seam4 < 0.12 and seam8 < 0.08
    assert seam8 < seam4

    # attention receptive-field error: bounded but dominant, and overlap
    # does NOT remove it (documented semantic, not a bug)
    attn4, attn8 = rel_rms(0.5, 4), rel_rms(0.5, 8)
    assert attn4 < 0.4 and attn8 < 0.4
    assert attn8 > 2.5 * seam8


def test_overlap_larger_than_tile_is_clamped():
    """overlap > tile used to blow up inside _feather (round-2 advisor
    finding): the ramp is now clamped per-axis to half the upscaled tile,
    and constants still come back exactly (weight normalisation)."""
    x = jnp.full((1, 20, 20, 1), 1.25, jnp.float32)
    up = lambda t: resize2d(t, (t.shape[1] * 4, t.shape[2] * 4), "bilinear")
    out = tiled_apply(up, x, (6, 6), overlap=8, upscale=4)
    assert out.shape == (1, 80, 80, 1)
    np.testing.assert_allclose(np.asarray(out), 1.25, rtol=1e-5)
