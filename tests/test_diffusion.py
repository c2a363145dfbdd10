"""Latent-diffusion stack: scheduler math, component shapes, end-to-end
train + CFG generate on tiny GRACE-like rasters."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_danet_tpu.models.diffusion import (
    DDPMScheduler,
    DiffusionConfig,
    LatentDiffusion,
    TextEncoder,
    UNet,
    VAE,
)


def test_scheduler_add_noise_limits(rng):
    s = DDPMScheduler(1000)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    # t=0: almost no noise
    x0 = s.add_noise(x, n, jnp.array([0, 0]))
    assert float(jnp.mean(jnp.abs(x0 - x))) < 0.05
    # t=999: almost pure noise
    x999 = s.add_noise(x, n, jnp.array([999, 999]))
    assert float(jnp.mean(jnp.abs(x999 - n))) < 0.35


def test_scheduler_step_denoises_perfect_eps(rng):
    """With the true noise as model output, iterated steps recover x0."""
    s = DDPMScheduler(1000)
    x0 = jnp.asarray(0.5 * rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    s.set_timesteps(10)
    z = s.add_noise(x0, n, jnp.array([s.timesteps[0]]))
    for t in s.timesteps:
        abar = s.alphas_cumprod[t]
        eps = (z - np.sqrt(abar) * x0) / np.sqrt(1 - abar)  # exact eps for z
        z = s.step(eps, int(t), z, key=None)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x0), atol=1e-3)


def test_text_encoder_shape():
    enc = TextEncoder(vocab_size=100, max_length=16, width=32, heads=4,
                      layers=2)
    ids = jnp.zeros((2, 16), jnp.int32)
    v = enc.init(jax.random.PRNGKey(0), ids)
    assert enc.apply(v, ids).shape == (2, 16, 32)


def test_text_encoder_causality():
    """Changing a later token must not affect earlier positions."""
    enc = TextEncoder(vocab_size=100, max_length=8, width=16, heads=2,
                      layers=1)
    a = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]])
    b = a.at[0, 6].set(99)
    v = enc.init(jax.random.PRNGKey(0), a)
    ya, yb = enc.apply(v, a), enc.apply(v, b)
    np.testing.assert_allclose(np.asarray(ya[0, :6]), np.asarray(yb[0, :6]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(ya[0, 7]), np.asarray(yb[0, 7]))


def test_vae_roundtrip_shapes(rng):
    vae = VAE(channels=(8, 16), latent_channels=4, out_channels=1)
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 1)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    v = vae.init({"params": k}, x, k)
    recon, mean, logvar = vae.apply(v, x, k)
    assert recon.shape == x.shape
    assert mean.shape == (2, 8, 10, 4)   # factor 2 for 2-level VAE
    assert logvar.shape == mean.shape


def test_unet_shape(rng):
    unet = UNet(4, 4, channels=(8, 16), context_dim=12, heads=2)
    z = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 5, 12))
    t = jnp.zeros((2,), jnp.int32)
    v = unet.init(jax.random.PRNGKey(0), z, ctx, t)
    assert unet.apply(v, z, ctx, t).shape == z.shape


@pytest.mark.slow
def test_latent_diffusion_end_to_end(rng):
    cfg = DiffusionConfig(
        vae_channels=(8, 16), unet_channels=(8, 16), context_dim=16,
        heads=2, cond_channels=3, grad_accum=1, num_inference_steps=4)
    ld = LatentDiffusion(cfg, sample_image_hw=(16, 16),
                         sample_cond_shape=(1, 16, 16, 3))
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    losses = [ld.train_batch(img, cond) for _ in range(3)]
    assert all(np.isfinite(losses))
    out = ld.generate(cond, image_hw=(16, 16), num_inference_steps=4)
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()
