"""Host-side preprocessing primitives (behavioural parity:
reference datasets.py), vectorised — no per-pixel Python loops.
"""
from __future__ import annotations

import numpy as np

from gan_danet_tpu.ops.gaussian import gaussian_matrix


def fill_placeholder_with_mean(
    data: np.ndarray,
    region=(slice(0, 14), slice(0, 12)),
    source=(slice(14, 16), slice(12, 14)),
) -> np.ndarray:
    """Overwrite a fixed corner region of every channel with the mean of a
    small interior patch (reference datasets.py:211-219 hardcodes
    [:, 0:14, 0:12] <- mean of [:, 14:16, 12:14]). Region/source are
    configurable so tiny synthetic grids work; defaults are faithful."""
    data = np.array(data, copy=True)
    for i in range(data.shape[-1]):
        mean_value = data[:, source[0], source[1], i].mean()
        data[:, region[0], region[1], i] = mean_value
    return data


def fill_placeholder_with_nearest(
    data: np.ndarray, placeholder: float = -9999, sigma: float = 3.0
) -> np.ndarray:
    """Normalised-convolution inpainting of placeholder pixels
    (reference datasets.py:222-250): gaussian-smooth the zero-filled field
    and the validity mask, divide, and substitute at placeholder sites.
    Vectorised over (T, channels) using the gaussian matrix operators.
    The reference smooths the full (T, H, W) variable — the time axis is
    included (scipy gaussian_filter on a 3-D array is separable over all
    three axes), reproduced here with a third gaussian matrix along T.

    Beyond the reference: non-finite pixels (NaN/inf) are treated as
    placeholders too. The reference loads pre-cleaned .npy inputs, but our
    NetCDF readers mask invalid values to NaN (readers.py), and
    ``NaN <= placeholder`` is False — without this, bad pixels would flow
    into the StandardScaler and NaN the whole channel."""
    data = np.array(data, copy=True)
    squeeze = data.ndim == 3
    if squeeze:
        data = data[..., None]
    t, h, w, c = data.shape
    gt = gaussian_matrix(t, sigma)
    gh = gaussian_matrix(h, sigma)
    gw = gaussian_matrix(w, sigma)

    mask_bad = (data <= placeholder) | ~np.isfinite(data)
    if not mask_bad.any():
        return data[..., 0] if squeeze else data
    filled = np.where(mask_bad, 0.0, data)
    valid = (~mask_bad).astype(np.float64)

    # smooth T, then H, then W for both stacks at once
    def smooth(x):
        y = np.einsum("st,thwc->shwc", gt, x)
        y = np.einsum("ah,thwc->tawc", gh, y)
        return np.einsum("bw,tawc->tabc", gw, y)

    smoothed = smooth(filled)
    mask_smoothed = smooth(valid)
    mask_smoothed[mask_smoothed == 0] = 1.0
    est = smoothed / mask_smoothed
    out = np.where(mask_bad, est, data).astype(data.dtype)
    return out[..., 0] if squeeze else out


def smooth_gldas_channels(hr_aux: np.ndarray, n_gldas: int, sigma: float = 3.0) -> np.ndarray:
    """Gaussian-smooth only the first `n_gldas` channels
    (reference datasets.py:430-437), all time steps at once via the matrix
    operators (the reference loops T x 36 scipy calls)."""
    t, h, w = hr_aux.shape[:3]
    gh = gaussian_matrix(h, sigma).astype(np.float32)
    gw = gaussian_matrix(w, sigma).astype(np.float32)
    gldas = hr_aux[..., :n_gldas].astype(np.float32)
    c = gldas.shape[-1]
    # batched BLAS matmuls (einsum loops these patterns ~10x slower)
    sm = np.matmul(gh, gldas.reshape(t, h, w * c)).reshape(t, h, w, c)
    sm = np.matmul(gw, np.ascontiguousarray(sm.transpose(0, 2, 1, 3))
                   .reshape(t, w, h * c))
    sm = sm.reshape(t, w, h, c).transpose(0, 2, 1, 3)
    out = np.concatenate([sm.astype(hr_aux.dtype), hr_aux[..., n_gldas:]], axis=-1)
    return out


def aug_cosine_kernel(n: int, seasonal_freq: int):
    """((n, K) float32 cosine kernel, K) for the FFT-domain augmentation
    perturbation — the SINGLE source of the reference's 0..+seasonal_freq
    bin quirk (datasets.py:318-347 iterates -f..+f but guards 0 <= idx,
    so only the non-negative bins perturb). Shared by the host path below
    and the fused device program (data/pipeline.py) so the two can never
    drift apart."""
    idxs = [i for i in range(-seasonal_freq, seasonal_freq + 1)
            if 0 <= i < n]
    if not idxs:
        return None, 0
    t_idx = np.arange(n)[:, None]                       # (n, 1)
    k = np.asarray([i % n for i in idxs])[None, :]      # (1, K)
    kernel = (np.cos(2.0 * np.pi * t_idx * k / n) / n).astype(np.float32)
    return kernel, len(idxs)


def frequency_domain_augmentation(
    data: np.ndarray,
    seasonal_freq: int,
    noise_level: float = 0.1,
    axis: int = 0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """FFT along `axis`, add N(0, noise_level) real noise to the low
    seasonal bins, inverse FFT, take the real part (reference
    datasets.py:318-347). Faithful quirk: the reference iterates
    -seasonal_freq..+seasonal_freq but guards with `0 <= idx`, so ONLY
    bins 0..seasonal_freq are perturbed — negative (tail) bins are
    skipped, and we reproduce that exactly."""
    rng = rng or np.random.default_rng()
    n = data.shape[axis]
    # DFT linearity: real(ifft(fft(x) + sparse)) == x + real(ifft(sparse)),
    # and for REAL per-bin noise real(ifft) reduces to a cosine kernel —
    # one (n, K) @ (K, rest) matmul instead of a full complex FFT
    # roundtrip over the cube (which is ~20 GB of complex128 at the
    # reference aux size).
    kernel, n_bins = aug_cosine_kernel(n, seasonal_freq)
    if n_bins == 0:
        return np.array(data, copy=True)

    moved = np.moveaxis(data, axis, 0)          # (n, ...rest)
    rest_shape = moved.shape[1:]
    noise = rng.normal(scale=noise_level,
                       size=(n_bins, int(np.prod(rest_shape))))

    # f32 matmul/add: f64 is ~17x slower on this host and the noise is
    # O(0.1) — f32 rounding is far below the injected perturbation
    delta = kernel @ noise.astype(np.float32)
    out = moved.astype(np.float32) + delta.reshape((n,) + rest_shape)
    return np.moveaxis(out, 0, axis).astype(data.dtype)


def coordinate_channels(n_time: int, grid, lat_range, lon_range):
    """(T,H,W,1) lat and lon channels (reference datasets.py:352-369 builds
    them via meshgrid + repeat)."""
    h, w = grid
    lat = np.linspace(lat_range[0], lat_range[1], h)
    lon = np.linspace(lon_range[0], lon_range[1], w)
    lat2, lon2 = np.meshgrid(lat, lon, indexing="ij")
    lat_c = np.broadcast_to(lat2[None, :, :, None], (n_time, h, w, 1))
    lon_c = np.broadcast_to(lon2[None, :, :, None], (n_time, h, w, 1))
    return lat_c.astype(np.float32), lon_c.astype(np.float32)
