"""The full preprocessing pipeline (behavioural parity:
reference datasets.py `load_data` / `load_data_with_augmentation`).

Stages (datasets.py:350-501):
  1. assemble hr_aux = [gldas 36ch | t2m, et, p, ro, sde, tp | lat, lon, dem]
     -> 45 channels at 0.25 deg
  2. placeholder fills (corner-mean + normalised-convolution inpainting)
  3. standardise GRACE cubes (flat StandardScaler each) and every aux
     channel separately
  4. gaussian-smooth (sigma=3) the GLDAS channels only
  5. STL-detrend both GRACE cubes (period 12, seasonal 13) -> (detrended,
     trend) pairs
  6. optional x2 frequency-domain augmentation along time (seasonal_freq
     12, noise 0.1), trends tiled to match

Raw inputs arrive as a `RawArrays` bundle from the NetCDF/np readers or the
synthetic generator — `load_raw` picks per DataConfig.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from gan_danet_tpu.core.config import DataConfig
from gan_danet_tpu.data import cache as cache_mod
from gan_danet_tpu.data.preprocess import (
    coordinate_channels,
    fill_placeholder_with_mean,
    fill_placeholder_with_nearest,
    frequency_domain_augmentation,
    smooth_gldas_channels,
)
from gan_danet_tpu.data.scalers import StandardScaler
from gan_danet_tpu.data.synthetic import RawArrays, make_synthetic_raw
from gan_danet_tpu.ops.stl import stl_operator


def load_raw(config: DataConfig) -> RawArrays:
    if config.synthetic:
        return make_synthetic_raw(config, config.synthetic_seed)
    from gan_danet_tpu.data.readers import load_raw_from_files

    return load_raw_from_files(config)


def _stl_detrend_np(cube: np.ndarray, period: int, seasonal: int):
    """Host-side batched STL via the precomputed linear operator
    (ops/stl.py). Returns (trend, detrended); reconstruction is exact."""
    t = cube.shape[0]
    a_t, _ = stl_operator(t, period=period, seasonal=seasonal)
    flat = cube.reshape(t, -1).astype(np.float32)
    trend = (a_t @ flat).reshape(cube.shape)
    return trend, cube - trend


def load_data(config: DataConfig, raw: RawArrays | None = None):
    """Returns ([detrended05, trend05], [detrended25, trend25],
    smoothed_hr_aux, scaler05, scaler025, aux_scalers) — the exact tuple
    shape of reference datasets.py:444."""
    raw = raw if raw is not None else load_raw(config)
    t = raw.grace_05.shape[0]
    h25, w25 = raw.grace_025.shape[1:3]

    lat_c, lon_c = coordinate_channels(t, (h25, w25), config.lat_range,
                                       config.lon_range)
    dem_c = np.broadcast_to(raw.dem[None, :, :, None], (t, h25, w25, 1))

    # ERA5-derived channel 0 (t2m, Kelvin) gets the inpainting pass in the
    # reference with placeholder=100 (datasets.py:390) — any value <= 100 K
    # is physically impossible and marks a fill site. NaNs from the NetCDF
    # readers' invalid-value masking are inpainted by the same pass.
    era5 = np.array(raw.era5, copy=True)
    era5[..., 0:1] = fill_placeholder_with_nearest(era5[..., 0:1],
                                                   placeholder=100.0)
    # remaining ERA5 channels are not inpainted by the reference (its .npy
    # inputs are NaN-free); ours may carry reader NaNs — inpaint those only
    if not np.isfinite(era5[..., 1:]).all():
        era5[..., 1:] = fill_placeholder_with_nearest(era5[..., 1:],
                                                      placeholder=-np.inf)

    hr_aux = np.concatenate(
        [raw.gldas, era5, lat_c, lon_c, dem_c], axis=-1
    ).astype(np.float32)
    if hr_aux.shape[-1] != config.n_aux:
        raise ValueError(
            f"aux stack has {hr_aux.shape[-1]} channels, expected {config.n_aux}"
        )

    # corner-region mean fill, scaled to the configured grid (the reference
    # hardcodes 0:14 x 0:12 of the 88x180 grid)
    r0 = max(1, round(14 / 88 * h25))
    c0 = max(1, round(12 / 180 * w25))
    hr_aux = fill_placeholder_with_mean(
        hr_aux,
        region=(slice(0, r0), slice(0, c0)),
        source=(slice(r0, min(r0 + 2, h25)), slice(c0, min(c0 + 2, w25))),
    )

    scaler05 = StandardScaler()
    scaler025 = StandardScaler()
    grace05 = scaler05.fit_transform(raw.grace_05).astype(np.float32)
    grace025 = scaler025.fit_transform(raw.grace_025).astype(np.float32)

    aux_scalers = []
    hr_aux_std = np.empty_like(hr_aux)
    for i in range(hr_aux.shape[-1]):
        s = StandardScaler()
        hr_aux_std[..., i] = s.fit_transform(hr_aux[..., i])
        aux_scalers.append(s)

    n_gldas = raw.gldas.shape[-1]
    smoothed = smooth_gldas_channels(hr_aux_std, n_gldas,
                                     config.gldas_smooth_sigma)

    trend05, detrended05 = _stl_detrend_np(grace05, config.stl_period,
                                           config.stl_seasonal)
    trend25, detrended25 = _stl_detrend_np(grace025, config.stl_period,
                                           config.stl_seasonal)

    return ([detrended05, trend05], [detrended25, trend25], smoothed,
            scaler05, scaler025, aux_scalers)


def load_data_with_augmentation(config: DataConfig, raw: RawArrays | None = None,
                                rng: np.random.Generator | None = None):
    """x`augmentation_factor` FFT-domain copies concatenated along time,
    trends tiled to match (reference datasets.py:451-501)."""
    ([d05, t05], [d25, t25], aux, s05, s025, s_aux) = load_data(config, raw)
    rng = rng or np.random.default_rng(config.synthetic_seed)

    k = config.augmentation_factor
    f = config.augmentation_seasonal_freq
    nl = config.augmentation_noise

    aug05 = [frequency_domain_augmentation(d05, f, nl, 0, rng) for _ in range(k)]
    aug25 = [frequency_domain_augmentation(d25, f, nl, 0, rng) for _ in range(k)]
    aug_aux = [frequency_domain_augmentation(aux, f, nl, 0, rng) for _ in range(k)]

    d05a = np.concatenate([d05] + aug05, axis=0)
    d25a = np.concatenate([d25] + aug25, axis=0)
    auxa = np.concatenate([aux] + aug_aux, axis=0)
    t05a = np.tile(t05, (1 + k, 1, 1))
    t25a = np.tile(t25, (1 + k, 1, 1))

    return ([d05a, t05a], [d25a, t25a], auxa, s05, s025, s_aux)


def load_or_build_cache(config: DataConfig, augmented: bool = True):
    """Cache-or-rebuild entry (reference GAN_DANet_train.ipynb cell 0:
    REBUILD_CACHE env honoured via DataConfig.from_env)."""
    if not config.rebuild_cache and cache_mod.cache_exists(config.cache_path):
        return cache_mod.load_cache(config.cache_path)
    loader = load_data_with_augmentation if augmented else load_data
    ([d05, t05], [d25, t25], aux, s05, s025, s_aux) = loader(config)
    cache_mod.save_cache(config.cache_path, d05, t05, d25, t25, aux,
                         s05, s025, s_aux)
    return ([d05, t05], [d25, t25], aux, s05, s025, s_aux)
