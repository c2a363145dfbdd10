"""Tiled raster inference with halo blending.

The reference applies the generator to whole rasters only (88x180 native
input for the 0.05deg product, test.ipynb cell 3) — fine up to 0.05deg, but
a finer target grid (or a wider domain) would blow past HBM with PAM's
(HW)^2 attention and the 45-channel aux stack. SURVEY.md §5 marks raster
tiling + halo as the scaling path beyond 0.05deg; this module implements it
TPU-first:

  * the raster is carved into fixed-size overlapping tiles (static shapes —
    ONE generator specialisation compiles for the tile size, not per-raster),
  * every tile runs through the SAME jitted apply_fn via a lax.scan over a
    precomputed (static) position table — one compiled program per raster
    shape, device-resident accumulation,
  * overlaps are blended with separable linear feathering ramps and a final
    weight normalisation, the same maths as the reference's `smooth_blend`
    edge feathering (test.ipynb:482) generalised to interior seams.

Semantics under tiling — GLOBAL attention becomes TILE-LOCAL
------------------------------------------------------------
PAM attends over every position of its input and CAM grams every channel
pair over the whole raster (reference models/generator.py:104-139), so
tiling is NOT a partition of the whole-raster computation: each tile's
attention receptive field silently shrinks to the tile (+nothing beyond
it). The reference never tiles (whole-raster only); this approximation is
new to this design and only matters beyond the 0.05deg grid where the
whole raster no longer fits.

The error is bounded empirically in tests/test_tiling.py
(test_tile_local_attention_error_band), which separates the two error
sources on a smooth GRACE-like field through a DANet generator:

  * conv-path seam error (attention gammas zeroed): small and shrinking
    with overlap (rel-RMS 0.07 -> 0.05 from overlap 4 -> 8 at tile 16);
    this is what feathering fixes;
  * attention receptive-field error (gammas active): the dominant term
    (rel-RMS ~0.29 for a random-weight generator with gamma=0.5) and
    essentially overlap-INSENSITIVE — it is not a seam artifact, so more
    overlap cannot buy it back. The test fails if either band degrades.

Practical guidance for `--tile`/`--tile-overlap`:

  * pick the largest tile that fits HBM (attention cost is (th*tw)^2) —
    a bigger attention window beats any amount of feathering;
  * overlap ~25% of the tile edge is enough to keep the conv-path seam
    error negligible; beyond that, extra overlap only costs compute;
  * fields with long-range structure that PAM genuinely exploits
    (teleconnections across the full plateau) lose that coupling under
    tiling — validate against a whole-raster run on a downsampled grid
    before trusting tiled products. (Trained GRACE generators sit far
    below the random-weight band: their gamma magnitudes are learned
    small, see DESIGN.md §3.)
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tile_positions(size: int, tile: int, overlap: int) -> np.ndarray:
    """Start offsets covering [0, size) with `tile`-long windows that
    overlap by >= `overlap`; the last window is clamped flush to the end."""
    if tile >= size:
        return np.array([0], dtype=np.int32)
    stride = max(1, tile - overlap)
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return np.asarray(sorted(set(starts)), dtype=np.int32)


def _feather(length: int, ramp: int) -> np.ndarray:
    """1-D blending profile: linear ramps over `ramp` samples at each end,
    flat 1.0 in the middle (smooth_blend's linear-ramp mask, generalised)."""
    w = np.ones(length, dtype=np.float32)
    if ramp > 0:
        r = (np.arange(ramp, dtype=np.float32) + 1.0) / (ramp + 1.0)
        w[:ramp] = r
        w[-ramp:] = r[::-1]
    return w


def tiled_apply(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    tile_hw: Tuple[int, int],
    overlap: int = 8,
    upscale: int = 4,
) -> jnp.ndarray:
    """Run `apply_fn` ((B, th, tw, C) -> (B, s*th, s*tw, C_out)) over
    overlapping tiles of `x` (B, H, W, C) and blend the seams.

    Requires H >= tile_hw[0] and W >= tile_hw[1] (pad the raster up first
    for smaller inputs). Returns (B, s*H, s*W, C_out).
    """
    b, h, w, c = x.shape
    th, tw = tile_hw
    if h < th or w < tw:
        raise ValueError(f"raster {h}x{w} smaller than tile {th}x{tw}")
    ys = tile_positions(h, th, overlap)
    xs = tile_positions(w, tw, overlap)
    # (n_tiles, 2) static position table
    pos = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1).reshape(-1, 2)

    s = upscale
    # clamp per-axis so the two ramps of a tile never overlap each other
    # (overlap > tile would otherwise make _feather's end-ramp overwrite
    # its start-ramp, or overrun the profile entirely)
    ramp = overlap * s // 2
    wy = _feather(th * s, min(ramp, th * s // 2))
    wx = _feather(tw * s, min(ramp, tw * s // 2))
    tile_weight = jnp.asarray(np.outer(wy, wx))[None, :, :, None]

    # probe output channel count without running the device computation
    c_out = jax.eval_shape(
        apply_fn, jax.ShapeDtypeStruct((b, th, tw, c), x.dtype)).shape[-1]

    def body(carry, p):
        acc, wsum = carry
        py, px = p[0], p[1]
        xt = jax.lax.dynamic_slice(x, (0, py, px, 0), (b, th, tw, c))
        yt = apply_fn(xt).astype(jnp.float32) * tile_weight
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(
                acc, (0, py * s, px * s, 0), (b, th * s, tw * s, c_out)) + yt,
            (0, py * s, px * s, 0))
        wsum = jax.lax.dynamic_update_slice(
            wsum,
            jax.lax.dynamic_slice(
                wsum, (0, py * s, px * s, 0), (1, th * s, tw * s, 1))
            + tile_weight,
            (0, py * s, px * s, 0))
        return (acc, wsum), None

    acc0 = jnp.zeros((b, h * s, w * s, c_out), jnp.float32)
    wsum0 = jnp.zeros((1, h * s, w * s, 1), jnp.float32)
    (acc, wsum), _ = jax.lax.scan(body, (acc0, wsum0), jnp.asarray(pos))
    return acc / jnp.maximum(wsum, 1e-8)


def tiled_apply_fn(
    apply_fn: Callable,
    tile_hw: Tuple[int, int],
    overlap: int = 8,
    upscale: int = 4,
) -> Callable:
    """Wrap a whole-raster apply_fn into a tiled one with the same
    (B,H,W,C)->(B,sH,sW,C_out) signature, for use anywhere the inference
    pipelines take `make_apply_fn` output (infer/downscale.py)."""

    def fn(x):
        return tiled_apply(apply_fn, x, tile_hw, overlap, upscale)

    return fn
