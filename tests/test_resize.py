"""resize2d must bit-match torch F.interpolate(align_corners=False) for the
exact size pairs the pipelines use (train input construction, upsample head,
0.05deg stages)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gan_danet_tpu.ops.resize import resize2d, resize2d_scale

CASES = [
    # (in_hw, out_hw, mode) — every resize the reference performs
    ((44, 90), (22, 45), "bicubic"),     # GRACE 0.5deg -> 22x45 (x0.5)
    ((88, 180), (22, 45), "bicubic"),    # aux x0.25
    ((22, 45), (44, 90), "bicubic"),     # generator upsample stage 1
    ((44, 90), (88, 180), "bicubic"),    # stage 2
    ((352, 720), (440, 900), "bicubic"), # 0.05deg x1.25
    ((88, 180), (352, 720), "bicubic"),  # smooth_blend reference x4
    ((22, 45), (88, 180), "bilinear"),   # skip fusion
    ((11, 23), (88, 180), "bilinear"),
]


@pytest.mark.parametrize("in_hw,out_hw,mode", CASES)
def test_matches_torch(in_hw, out_hw, mode, rng):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize2d(jnp.asarray(x), out_hw, mode))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                      mode=mode, align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    # matmul-form accumulation differs from torch's direct 4-tap sums in the
    # last float32 bits; 5e-4 absolute is far below any physical signal here
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_scale_factor_semantics(rng):
    x = rng.standard_normal((1, 44, 90, 1)).astype(np.float32)
    got = np.asarray(resize2d_scale(jnp.asarray(x), 0.5, "bicubic"))
    assert got.shape == (1, 22, 45, 1)


def test_identity():
    x = jnp.arange(12.0).reshape(1, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(resize2d(x, (3, 4), "bicubic")),
                               np.asarray(x))


def test_2d_input(rng):
    x = rng.standard_normal((44, 90)).astype(np.float32)
    got = np.asarray(resize2d(jnp.asarray(x), (88, 180), "bilinear"))
    want = (
        F.interpolate(torch.from_numpy(x)[None, None], size=(88, 180),
                      mode="bilinear", align_corners=False)[0, 0].numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spline_zoom2d_matches_scipy(rng):
    """Device spline zoom (precomputed operator matmuls) must match
    scipy.ndimage.zoom exactly — scipy is the CPU oracle; the operator is
    extracted FROM scipy by resampling the identity basis, so this guards
    the application path (axis order, transposes, f32 accumulation).
    Covers the three stage-2 shapes: trend x5 (order 3), mask x5
    (order 1), bias x1.25 (order 3), uncertainty x5 (order 0)."""
    from scipy.ndimage import zoom as scipy_zoom

    from gan_danet_tpu.ops.resize import spline_zoom2d

    cases = [
        ((3, 16, 20), (80, 100), 3),    # trend: (T,H25,W25) -> x5
        ((16, 20), (80, 100), 1),       # mask: 2-D x5
        ((3, 64, 80), (80, 100), 3),    # bias: x1.25
        ((3, 16, 20), (80, 100), 0),    # uncertainty: nearest
    ]
    for shape, size, order in cases:
        x = rng.standard_normal(shape).astype(np.float32)
        got = np.asarray(spline_zoom2d(jnp.asarray(x), size, order=order))
        factors = (1,) * (len(shape) - 2) + (size[0] / shape[-2],
                                             size[1] / shape[-1])
        want = scipy_zoom(x.astype(np.float64), factors, order=order)
        assert got.shape == want.shape == shape[:-2] + size
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spline_zoom2d_reference_scale_slices():
    """Spot-check the REFERENCE grid sizes (88->440, 180->900, 352->440,
    720->900) on one time slice so the full-size operators are covered
    without a slow full-cube scipy run."""
    from scipy.ndimage import zoom as scipy_zoom

    from gan_danet_tpu.ops.resize import spline_zoom2d

    rng = np.random.default_rng(1)
    for (h, w), (ho, wo) in [((88, 180), (440, 900)),
                             ((352, 720), (440, 900))]:
        x = rng.standard_normal((1, h, w)).astype(np.float32)
        got = np.asarray(spline_zoom2d(jnp.asarray(x), (ho, wo), order=3))
        want = scipy_zoom(x[0].astype(np.float64), (ho / h, wo / w), order=3)
        np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)


def test_spline_zoom2d_order0_nan_local():
    """order=0 runs as a gather, so NaN stays LOCAL exactly like scipy's
    nearest-neighbour zoom — the ensemble uncertainty grid is NaN outside
    the plateau mask (test.ipynb:613) and a one-hot matmul would have
    poisoned every output with 0*NaN (round-4 regression caught by the
    CLI ensemble->infer chain test)."""
    from scipy.ndimage import zoom as scipy_zoom

    from gan_danet_tpu.ops.resize import spline_zoom2d

    x = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
    x[0, 0, 1] = np.nan
    got = np.asarray(spline_zoom2d(jnp.asarray(x), (6, 8), order=0))
    want = scipy_zoom(x[0], (2.0, 2.0), order=0)[None]
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want))
    assert np.isfinite(got).sum() > 0
