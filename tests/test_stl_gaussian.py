"""Batched STL operator and gaussian-matrix smoothing."""
import numpy as np
import scipy.ndimage

import jax.numpy as jnp

from gan_danet_tpu.ops.gaussian import gaussian_filter2d, gaussian_matrix
from gan_danet_tpu.ops.stl import stl_detrend, stl_operator


def test_gaussian_matrix_matches_scipy(rng):
    x = rng.standard_normal((64,)).astype(np.float64)
    for sigma in (1.5, 3.0):
        m = gaussian_matrix(64, sigma)
        got = m @ x.astype(np.float32)
        want = scipy.ndimage.gaussian_filter1d(x, sigma, mode="reflect")
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian2d_matches_scipy(rng):
    x = rng.standard_normal((1, 40, 52, 2)).astype(np.float32)
    got = np.asarray(gaussian_filter2d(jnp.asarray(x), sigma=3.0))
    want = np.stack(
        [
            np.stack(
                [scipy.ndimage.gaussian_filter(x[0, :, :, c], 3.0, mode="reflect")
                 for c in range(2)], axis=-1)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_stl_reconstruction_invariant(rng):
    """The reference verifies trend + detrended == original to 8.9e-16
    (test.ipynb cell 3). Exact by construction here."""
    cube = rng.standard_normal((48, 5, 7)).astype(np.float32)
    trend, detrended = stl_detrend(jnp.asarray(cube))
    np.testing.assert_allclose(np.asarray(trend + detrended), cube, atol=1e-6)


def test_stl_recovers_linear_trend():
    t = np.arange(96, dtype=np.float32)
    series = 0.5 * t + 3.0
    cube = np.tile(series[:, None, None], (1, 2, 2))
    trend, detrended = stl_detrend(jnp.asarray(cube))
    # pure linear data: trend should capture nearly everything
    interior = slice(12, -12)
    np.testing.assert_allclose(np.asarray(trend)[interior, 0, 0],
                               series[interior], rtol=0.05, atol=1.0)
    assert np.abs(np.asarray(detrended)[interior]).max() < 2.0


def test_stl_separates_seasonality():
    t = np.arange(120, dtype=np.float32)
    seasonal = 2.0 * np.sin(2 * np.pi * t / 12)
    trend_true = 0.1 * t
    cube = (trend_true + seasonal)[:, None, None]
    trend, detrended = stl_detrend(jnp.asarray(cube))
    # trend estimate should NOT contain the seasonal oscillation
    interior = slice(12, -12)
    resid = np.asarray(trend)[interior, 0, 0] - trend_true[interior]
    assert np.std(resid) < 0.3
    # detrended keeps the seasonal signal
    assert np.std(np.asarray(detrended)[interior, 0, 0]) > 1.0


def test_stl_operator_is_linear(rng):
    a_t, a_s = stl_operator(60)
    y1 = rng.standard_normal(60)
    y2 = rng.standard_normal(60)
    np.testing.assert_allclose(a_t @ (y1 + y2), a_t @ y1 + a_t @ y2, atol=1e-5)


def test_detrend_and_compare_exact_reconstruction(rng):
    from gan_danet_tpu.ops.stl import detrend_and_compare

    t = np.arange(48, dtype=np.float32)
    cube = (0.1 * t[:, None, None]
            + np.sin(2 * np.pi * t / 12)[:, None, None]
            + rng.standard_normal((48, 4, 5)).astype(np.float32))
    trend, detrended, recon, max_err = detrend_and_compare(cube)
    assert trend.shape == detrended.shape == recon.shape == cube.shape
    # exact by construction (the reference observed 8.9e-16)
    assert max_err < 1e-5
    np.testing.assert_allclose(recon, cube, atol=1e-5)
