"""Synthetic GRACE-like dataset generator.

The reference README promises a `TEST_MODE=1` synthetic fallback that was
never implemented (SURVEY.md §4.7), and its real inputs + 1.35 GiB cache are
LFS-stripped from the snapshot. This module IS that missing capability: it
fabricates statistically faithful raw arrays (trend + annual cycle + spatially
correlated noise, amplitudes anchored to the shipped cache scaler stats:
0.5deg std 7.28, 0.25deg std 8.68 — BASELINE.md) that flow through the real
preprocessing pipeline, at full size or CI-tiny size.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from gan_danet_tpu.core.config import DataConfig


@dataclass
class RawArrays:
    """Everything `load_data` needs, independent of where it came from
    (NetCDF readers / .npy files / synthesis)."""

    grace_05: np.ndarray       # (T, H05, W05) TWSA anomalies, 0.5 deg
    grace_025: np.ndarray      # (T, H025, W025)
    gldas: np.ndarray          # (T, H025, W025, 36)
    era5: np.ndarray           # (T, H025, W025, 6): t2m, et, p, ro, sde, tp
    dem: np.ndarray            # (H025, W025)
    mask_low: np.ndarray       # (H05, W05) plateau mask {0,1}
    mask_high: np.ndarray      # (H025, W025)


def _correlated_field(rng, shape_hw: Tuple[int, int], corr: float = 6.0) -> np.ndarray:
    """Spatially smooth random field via FFT low-pass of white noise."""
    h, w = shape_hw
    noise = rng.standard_normal((h, w))
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    lowpass = np.exp(-((fy * corr) ** 2 + (fx * corr) ** 2) * 20.0)
    field = np.real(np.fft.ifft2(np.fft.fft2(noise) * lowpass))
    field = field / (field.std() + 1e-9)
    return field


def make_synthetic_raw(config: DataConfig = DataConfig(), seed: int = 0) -> RawArrays:
    """Generate a physically plausible TWSA scene.

    Ground truth lives at 0.25 deg: seasonal hydrology + decadal trend +
    correlated anomalies. The 0.5 deg product is its block-average (as a
    real coarse-resolution satellite product would be), so that
    super-resolution is a well-posed learning problem. Aux channels are
    noisy nonlinear views of the same latent water-storage signal.
    """
    rng = np.random.default_rng(seed)
    t = config.n_time
    h05, w05 = config.grid_05
    h25, w25 = config.grid_025
    assert h25 == 2 * h05 and w25 == 2 * w05, "grids must nest 2x"

    months = np.arange(t, dtype=np.float64)
    phase = 2 * np.pi * months / 12.0

    # latent high-res water storage signal (cm of equivalent water height)
    base = 5.0 * _correlated_field(rng, (h25, w25), 4.0)
    season_amp = 6.0 + 2.0 * _correlated_field(rng, (h25, w25), 3.0)
    season_phase = 0.5 * _correlated_field(rng, (h25, w25), 3.0)
    trend_rate = 0.03 * _correlated_field(rng, (h25, w25), 2.0)

    grace_025 = (
        base[None]
        + season_amp[None] * np.sin(phase[:, None, None] + season_phase[None])
        + trend_rate[None] * months[:, None, None]
    )
    # month-to-month weather noise, spatially correlated
    for i in range(t):
        grace_025[i] += 1.5 * _correlated_field(rng, (h25, w25), 8.0)
    # anchor amplitude to the reference's 0.25deg scaler std (8.68)
    grace_025 *= 8.68 / grace_025.std()

    # the 0.5 deg product: 2x2 block mean + instrument noise
    grace_05 = grace_025.reshape(t, h05, 2, w05, 2).mean(axis=(2, 4))
    grace_05 += 0.3 * rng.standard_normal(grace_05.shape)

    # aux channels: nonlinear views of the latent signal + independent
    # noise (all float32 — float64 element ops are ~17x slower on the
    # build hosts and precision is irrelevant for synthesized noise)
    grace_f32 = grace_025.astype(np.float32)

    def aux_channel(strength, lag):
        shifted = np.roll(grace_f32, lag, axis=0)
        noise = rng.standard_normal((t, h25, w25), dtype=np.float32)
        return np.float32(strength) * shifted + np.float32(2.0) * noise

    gldas = np.stack(
        [aux_channel(rng.uniform(0.2, 0.9), int(rng.integers(0, 3)))
         for _ in range(36)], axis=-1
    )
    era5 = np.stack(
        [aux_channel(rng.uniform(0.3, 0.9), int(rng.integers(0, 2)))
         for _ in range(6)], axis=-1
    )
    # t2m is 2m air temperature in Kelvin (like real ERA5), so the
    # reference's placeholder=100 inpainting quirk (datasets.py:390) is
    # meaningful: values <= 100 K mark fill sites. The offset is removed
    # by per-channel standardisation, so downstream values are unchanged.
    era5[..., 0] += np.float32(270.0)

    dem = (4000.0 + 1500.0 * _correlated_field(rng, (h25, w25), 3.0)).astype(np.float32)

    # plateau mask: a smooth blob covering the interior (like the TP boundary)
    yy = np.linspace(-1, 1, h25)[:, None]
    xx = np.linspace(-1, 1, w25)[None, :]
    blob = ((yy**2 + 0.6 * xx**2) + 0.25 * _correlated_field(rng, (h25, w25), 3.0)) < 0.8
    mask_high = blob.astype(np.float32)
    mask_low = mask_high.reshape(h05, 2, w05, 2).max(axis=(1, 3))

    return RawArrays(
        grace_05=grace_05.astype(np.float32),
        grace_025=grace_025.astype(np.float32),
        gldas=gldas,
        era5=era5,
        dem=dem,
        mask_low=mask_low,
        mask_high=mask_high,
    )


def tiny_config(n_time: int = 36) -> DataConfig:
    """CI-sized config: 8x10 / 16x20 grids, short series. Keeps every
    pipeline stage meaningful (STL needs a few annual cycles)."""
    return DataConfig(
        n_time=n_time,
        grid_05=(8, 10),
        grid_025=(16, 20),
        grid_005=(80, 100),
        synthetic=True,
    )
