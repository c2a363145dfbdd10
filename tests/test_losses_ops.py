"""SSIM / TV / BCE parity against torch oracles reproducing the reference
formulas (models/losses.py)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gan_danet_tpu.models.losses import bce_with_logits, discriminator_loss, mse
from gan_danet_tpu.ops.ssim import ssim
from gan_danet_tpu.ops.tv import tv_loss


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    coords = torch.arange(window_size, dtype=torch.float32)
    g = torch.exp(-((coords - window_size // 2) ** 2) / (2 * sigma**2))
    g = (g / g.sum()).unsqueeze(1)
    w2 = (g @ g.t()).unsqueeze(0).unsqueeze(0)
    c = img1.size(1)
    window = w2.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=c)
    mu2 = F.conv2d(img2, window, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=c) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=c) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=c) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean()


def test_ssim_matches_torch(rng):
    x = rng.standard_normal((2, 32, 40, 1)).astype(np.float32)
    y = (x + 0.1 * rng.standard_normal(x.shape)).astype(np.float32)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    want = float(_torch_ssim(torch.from_numpy(x).permute(0, 3, 1, 2),
                             torch.from_numpy(y).permute(0, 3, 1, 2)))
    assert abs(got - want) < 1e-5


def test_ssim_identical_images(rng):
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 1)).astype(np.float32))
    assert float(ssim(x, x)) > 0.999


def _torch_tv(x, weight):
    b = x.size(0)
    h_tv = (x[:, :, 1:, :] - x[:, :, :-1, :]).pow(2).sum()
    w_tv = (x[:, :, :, 1:] - x[:, :, :, :-1]).pow(2).sum()
    return weight * 2 * (h_tv / x[:, :, 1:, :].numel() + w_tv / x[:, :, :, 1:].numel()) / b


def test_tv_matches_torch(rng):
    x = rng.standard_normal((3, 16, 20, 1)).astype(np.float32)
    got = float(tv_loss(jnp.asarray(x), 1e-5))
    want = float(_torch_tv(torch.from_numpy(x).permute(0, 3, 1, 2), 1e-5))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_matches_torch(rng):
    logits = rng.standard_normal((8, 1)).astype(np.float32)
    targets = (rng.random((8, 1)) > 0.5).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    want = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_discriminator_loss_scale(rng):
    real = jnp.asarray(rng.standard_normal((4, 1)).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal((4, 1)).astype(np.float32))
    d = float(discriminator_loss(real, fake))
    want = 0.5 * (
        float(bce_with_logits(real, jnp.ones_like(real)))
        + float(bce_with_logits(fake, jnp.zeros_like(fake)))
    )
    np.testing.assert_allclose(d, want, rtol=1e-6)


def test_mse(rng):
    a = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    np.testing.assert_allclose(float(mse(a, b)),
                               float(np.mean((np.asarray(a) - np.asarray(b)) ** 2)),
                               rtol=1e-6)
