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

import functools as _functools
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


def _aug_kernel(n: int, seasonal_freq: int) -> tuple:
    """Alias of preprocess.aug_cosine_kernel — the ONE source of the
    augmentation kernel + bin-selection quirk, shared by the host and
    fused-device paths so they can never drift apart."""
    from gan_danet_tpu.data.preprocess import aug_cosine_kernel

    return aug_cosine_kernel(n, seasonal_freq)


def infer_original_length(trend: np.ndarray, augmentation_factor: int) -> int:
    """Length of the ORIGINAL chronological series inside a possibly
    FFT-augmented stack, derived from the DATA rather than config
    (config.n_time describes the reference dataset, not whatever series a
    real-data ingest produced — readers take T from the files).

    load_data_with_augmentation TILES the trend cube to the augmented
    length (reference datasets.py:451-501: trends repeat verbatim), so an
    augmented stack is detected exactly: n divides by (1+k) and the first
    two trend tiles are bit-identical (float equality — STL trends of
    real data never repeat by chance). Anything else is an unaugmented
    series of length n."""
    n = trend.shape[0]
    f = 1 + max(0, int(augmentation_factor))
    if f > 1 and n % f == 0:
        t = n // f
        if t > 0 and np.array_equal(trend[:t], trend[t:2 * t]):
            return t
    return n


def _scaler_from_stats(mean: float, scale: float) -> StandardScaler:
    s = StandardScaler()
    s.mean_ = np.array([float(mean)])
    sc = float(scale)
    s.scale_ = np.array([sc if sc > 0 else 1.0])
    return s


def _run_device_stages(g05, g25, aux, noise, gh, gw, a_t, kernel,
                       *, n_gldas: int):
    """The fused device program behind _device_stages, defined ONCE at
    module level and jitted with the operators as traced arguments — a
    per-call `@jax.jit` closure would re-trace and (on remote-compile
    backends) re-COMPILE the whole program on every preprocessing run."""
    import jax.numpy as jnp

    t = g05.shape[0]

    def standardise(x):
        m = jnp.mean(x)
        s = jnp.std(x)
        s = jnp.where(s > 0, s, 1.0)
        return (x - m) / s, m, s

    g05s, m05, s05 = standardise(g05)
    g25s, m25, s25 = standardise(g25)

    m_aux = jnp.mean(aux, axis=(0, 1, 2))
    s_aux = jnp.std(aux, axis=(0, 1, 2))
    s_aux = jnp.where(s_aux > 0, s_aux, 1.0)
    aux_std = (aux - m_aux) / s_aux

    gl = aux_std[..., :n_gldas]
    sm = jnp.einsum("ah,thwc->tawc", gh, gl,
                    preferred_element_type=jnp.float32)
    sm = jnp.einsum("bw,tawc->tabc", gw, sm,
                    preferred_element_type=jnp.float32)
    aux_sm = jnp.concatenate([sm, aux_std[..., n_gldas:]], axis=-1)

    def detrend(cube):
        flat = cube.reshape(t, -1)
        trend = jnp.einsum("ts,sp->tp", a_t, flat,
                           preferred_element_type=jnp.float32).reshape(
                               cube.shape)
        return trend, cube - trend

    t05, d05 = detrend(g05s)
    t25, d25 = detrend(g25s)

    if noise is not None:
        def augment(d, noise_list):
            flat = d.reshape(t, -1)
            copies = [flat + jnp.matmul(
                kernel, nz, preferred_element_type=jnp.float32)
                for nz in noise_list]
            return jnp.concatenate([flat] + copies).reshape(
                (t * (1 + len(noise_list)),) + d.shape[1:])

        n05, n25, naux = noise
        d05o, d25o, aux_o = d05, d25, aux_sm
        d05 = augment(d05o, n05)
        d25 = augment(d25o, n25)
        aux_sm = augment(aux_o, naux)
        t05 = jnp.tile(t05, (1 + len(n05), 1, 1))
        t25 = jnp.tile(t25, (1 + len(n25), 1, 1))

    return (d05, t05, d25, t25, aux_sm,
            (m05, s05), (m25, s25), (m_aux, s_aux))


@_functools.lru_cache(maxsize=1)
def _jitted_device_stages():
    """jit applied lazily (jax is not imported at module load for
    host-only users) but exactly ONCE per process, so repeat runs hit
    jax's executable cache (keyed on argument shapes/pytree structure)."""
    import jax

    return jax.jit(_run_device_stages, static_argnames=("n_gldas",))


def _device_stages(grace_05, grace_025, hr_aux, n_gldas: int,
                   config: DataConfig, aug_noise=None,
                   to_host: bool = True):
    """Stages 3-5(+6) of load_data as ONE jit-compiled device program
    (BASELINE.json north-star: a "jit-compiled device-resident
    preprocessing stage"): standardise both GRACE cubes and every aux
    channel, gaussian-smooth the GLDAS channels (matrix operators ->
    MXU matmuls), STL-detrend both cubes ((T,T) operator matmul), and —
    when `aug_noise=(noise05, noise25, noise_aux)` lists are given — the
    FFT-domain augmentation (cosine-kernel matmuls) with the augmented
    concat, all fused so raw arrays upload ONCE and outputs download
    ONCE (per-stage round-trips dominated the wall over the tunneled
    test chip: 287 s -> see VALIDATION.md).
    The host reference path computes scaler stats in float64; the device
    program is float32 throughout — pipelines agree to f32 tolerance
    (tests/test_data.py::test_device_preprocess_matches_host)."""
    import jax
    import jax.numpy as jnp

    from gan_danet_tpu.ops.gaussian import gaussian_matrix

    t = grace_05.shape[0]
    h, w = hr_aux.shape[1:3]
    gh = jnp.asarray(gaussian_matrix(h, config.gldas_smooth_sigma)
                     .astype(np.float32))
    gw = jnp.asarray(gaussian_matrix(w, config.gldas_smooth_sigma)
                     .astype(np.float32))
    a_t, _ = stl_operator(t, period=config.stl_period,
                          seasonal=config.stl_seasonal)
    a_t = jnp.asarray(a_t)
    kernel = (jnp.asarray(_aug_kernel(t, config.augmentation_seasonal_freq)[0])
              if aug_noise is not None else None)

    if aug_noise is not None:
        aug_noise = tuple(
            [jnp.asarray(nz.astype(np.float32)) for nz in group]
            for group in aug_noise)
    run = _jitted_device_stages()
    (d05, t05, d25, t25, aux_sm, st05, st25, st_aux) = run(
        jnp.asarray(grace_05, jnp.float32),
        jnp.asarray(grace_025, jnp.float32),
        jnp.asarray(hr_aux, jnp.float32),
        aug_noise, gh, gw, a_t, kernel, n_gldas=n_gldas)

    scaler05 = _scaler_from_stats(*jax.device_get(st05))
    scaler025 = _scaler_from_stats(*jax.device_get(st25))
    m_aux, s_aux = (np.asarray(v) for v in jax.device_get(st_aux))
    aux_scalers = [_scaler_from_stats(m_aux[i], s_aux[i])
                   for i in range(len(m_aux))]
    if not to_host:
        # device-resident handoff: the cubes stay in HBM as jax arrays —
        # ModelTrainer/EnsembleTrainer consume them directly
        # (dataset_to_device's jnp.asarray is then a no-op), so the
        # preprocess -> train flow never round-trips ~GBs through host.
        # Host materialisation is only needed for the npz cache contract.
        return ([d05, t05], [d25, t25], aux_sm,
                scaler05, scaler025, aux_scalers)
    return ([np.asarray(d05), np.asarray(t05)],
            [np.asarray(d25), np.asarray(t25)],
            np.asarray(aux_sm), scaler05, scaler025, aux_scalers)


def _assemble_aux(config: DataConfig, raw: RawArrays) -> np.ndarray:
    """Host front half of load_data: aux-stack assembly + placeholder
    fills (ingest-adjacent, stays on host by design — SURVEY.md §7)."""
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
    return fill_placeholder_with_mean(
        hr_aux,
        region=(slice(0, r0), slice(0, c0)),
        source=(slice(r0, min(r0 + 2, h25)), slice(c0, min(c0 + 2, w25))),
    )


def load_data(config: DataConfig, raw: RawArrays | None = None,
              to_host: bool = True):
    """Returns ([detrended05, trend05], [detrended25, trend25],
    smoothed_hr_aux, scaler05, scaler025, aux_scalers) — the exact tuple
    shape of reference datasets.py:444.

    to_host=False (device_preprocess only) keeps the cubes in HBM as jax
    arrays for a zero-round-trip handoff into the trainers."""
    if not to_host and not config.device_preprocess:
        raise ValueError("to_host=False requires device_preprocess=True")
    raw = raw if raw is not None else load_raw(config)
    hr_aux = _assemble_aux(config, raw)

    if config.device_preprocess:
        return _device_stages(raw.grace_05, raw.grace_025, hr_aux,
                              raw.gldas.shape[-1], config, to_host=to_host)

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
                                rng: np.random.Generator | None = None,
                                to_host: bool = True):
    """x`augmentation_factor` FFT-domain copies concatenated along time,
    trends tiled to match (reference datasets.py:451-501).

    With `device_preprocess` the augmentation fuses into the SAME device
    program as standardise/smooth/detrend (_device_stages): noise is
    drawn on host in the EXACT rng order of the host path (so both
    pipelines consume identical randomness and agree to f32 tolerance),
    everything else runs on the accelerator with one upload/download —
    or NO download with to_host=False (the trainers consume jax arrays
    directly; only the npz cache contract needs host arrays)."""
    if not to_host and not config.device_preprocess:
        raise ValueError("to_host=False requires device_preprocess=True")
    rng = rng or np.random.default_rng(config.synthetic_seed)
    k = config.augmentation_factor
    f = config.augmentation_seasonal_freq
    nl = config.augmentation_noise

    if config.device_preprocess:
        raw = raw if raw is not None else load_raw(config)
        hr_aux = _assemble_aux(config, raw)
        t = raw.grace_05.shape[0]
        _, n_bins = _aug_kernel(t, f)

        def draws(shape):
            rest = int(np.prod(shape[1:]))
            return [rng.normal(scale=nl, size=(n_bins, rest))
                    for _ in range(k)]

        # host-path rng consumption order: d05 copies, d25 copies, aux
        noise = (draws(raw.grace_05.shape), draws(raw.grace_025.shape),
                 draws(hr_aux.shape))
        return _device_stages(raw.grace_05, raw.grace_025, hr_aux,
                              raw.gldas.shape[-1], config, aug_noise=noise,
                              to_host=to_host)

    ([d05, t05], [d25, t25], aux, s05, s025, s_aux) = load_data(config, raw)

    fda = frequency_domain_augmentation
    aug05 = [fda(d05, f, nl, 0, rng) for _ in range(k)]
    aug25 = [fda(d25, f, nl, 0, rng) for _ in range(k)]
    aug_aux = [fda(aux, f, nl, 0, rng) for _ in range(k)]

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
