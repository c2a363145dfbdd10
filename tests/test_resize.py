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
