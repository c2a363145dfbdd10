"""Edge-feathered region blending (reference test.ipynb `smooth_blend`,
cell 3 :482): inside a rectangular region, blend the generated field with a
reference field using a mask that ramps 0->1 over `sigma` pixels at the
region border and is then gaussian-softened (sigma).

Device-resident and jittable (the reference round-trips through numpy for
the mask build each call).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from gan_danet_tpu.ops.gaussian import gaussian_matrix


@functools.lru_cache(maxsize=16)
def _blend_mask(h: int, w: int, sigma: int) -> np.ndarray:
    mask = np.ones((h, w), dtype=np.float64)
    ramp = np.linspace(0, 1, sigma)
    mask[0:sigma, :] = ramp[:, None]
    mask[-sigma:, :] = ramp[::-1][:, None]
    mask[:, 0:sigma] = np.maximum(mask[:, 0:sigma], ramp[None, :])
    mask[:, -sigma:] = np.maximum(mask[:, -sigma:], ramp[::-1][None, :])
    gh = gaussian_matrix(h, float(sigma))
    gw = gaussian_matrix(w, float(sigma))
    mask = gh @ mask @ gw.T
    return mask.astype(np.float32)


def smooth_blend(
    generated: jnp.ndarray,
    reference: jnp.ndarray,
    region: Tuple[int, int, int, int],
    sigma: int = 5,
) -> jnp.ndarray:
    """generated: (B, H, W, C); reference: (B, H', W', C) with the region
    valid in both. region = (row_start, row_end, col_start, col_end).
    Returns generated with the region blended toward reference (mask=1 =>
    reference wins — faithful to the reference's convention)."""
    sr, er, sc, ec = region
    mask = jnp.asarray(_blend_mask(er - sr, ec - sc, sigma))[None, :, :, None]
    gen_region = generated[:, sr:er, sc:ec, :]
    ref_region = reference[:, sr:er, sc:ec, :]
    blended = gen_region * (1.0 - mask) + ref_region * mask
    return generated.at[:, sr:er, sc:ec, :].set(blended)
