"""The two-stage inference/export pipelines (behavioural parity:
test.ipynb cells 1 & 3 — SURVEY.md §2.7, §3.2-3.3).

Stage 1 (0.25deg, `predict_025`): the training-style coarsened-input
forward, mild histogram match (weight 0.2), trend re-add, inverse scaling,
plateau masking, bias product for stage 2, HDF5 exports, Pearson r of the
spatial-mean series.

Stage 2 (0.05deg, `predict_005`): scale-transfer — the SAME generator fed
NATIVE 0.25deg inputs, x4 forward + bicubic x1.25 => 0.05deg, optional
histogram match (weight 0.0), edge blend against bicubic GRACE, trend/
scale/mask/bias post-processing, NetCDF+CSV exports.

TPU-first: the entire per-batch path (input build -> forward -> histogram
match -> blend) is one jitted device program, and the stage-2
post-processing zooms (trend x5, mask x5, bias x1.25, uncertainty x5 —
the reference's host scipy calls, test.ipynb cell 3) run on device as
precomputed spline-operator matmuls with exact scipy.ndimage.zoom
semantics (ops/resize.spline_zoom_matrix). Only ingest, the final stacks,
and the HDF5/NetCDF writes stay on host.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


from gan_danet_tpu.data.scalers import as_scaler_stats
from gan_danet_tpu.infer import export as exp
from gan_danet_tpu.infer.blend import smooth_blend
from gan_danet_tpu.ops.histmatch import batched_histogram_match
from gan_danet_tpu.ops.resize import resize2d
from gan_danet_tpu.train.gan import build_inputs


def make_apply_fn(generator, params, batch_stats=None):
    """Close a flax generator module over its variables, yielding the
    uniform `apply_fn(x) -> (B, 4H, 4W, 1)` interface the pipelines take.
    Works for the BN-carrying DANet generator (batch_stats given) and for
    stateless generators like HAT (the reference ran the same two-stage
    pipeline with HAT — .ipynb_checkpoints/Test_hat-checkpoint.ipynb,
    SURVEY.md §2.9)."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def apply_fn(x):
        return generator.apply(variables, x, train=False)

    return apply_fn


# Per-process compile cache for the scanned prediction programs: the
# per-anchor cache dict lives as an ATTRIBUTE of the caller's apply_fn
# closure, so the only root is the anchor itself — when the caller drops
# apply_fn, the {key: jitted} dict (which references apply_fn back
# through the step closure, a gc-collectable cycle) dies with it. A
# module-level WeakKeyDictionary would NOT work: its values strongly
# reference the key via the closure, making entries immortal. Each
# predict_* call builds a fresh `step` closure, which would otherwise
# re-trace — and on a remote-compile backend re-COMPILE — the whole scan
# per call (measured: a "warm" repeat predict_005 cost the same minutes
# as the cold one).
_SCAN_CACHE_ATTR = "_gan_danet_scan_cache"


def _mesh_key(mesh):
    """Stable mesh identity for the compile cache: axis names + layout +
    device ids. `id(mesh)` would be wrong twice over — CPython reuses ids
    after gc (a NEW mesh allocated at a dead mesh's address would be
    served the old mesh's compiled program), and two same-shape meshes
    over the same devices are semantically identical so they SHOULD share
    one compiled program."""
    if mesh is None:
        return None
    return (mesh.axis_names, mesh.devices.shape,
            tuple(d.id for d in mesh.devices.flat))


def _scan_batches(step, arrs, n: int, batch_size: int,
                  to_host: bool = True, mesh=None, cache=None):
    """Run `step` over the whole (device-resident) series as ONE scanned
    program: per-batch Python dispatch + host->device copies dominate wall
    time on remote TPUs. Wrap-around padding mirrors Batcher; returns the
    de-padded (T, H, W) stack — on host by default, or as a device array
    (to_host=False) so downstream post-processing can stay device-resident
    (every host materialisation of a (181,440,900) cube costs a ~300 MB
    transfer on tunneled backends).

    With a mesh, each gathered batch is sharding-constrained over 'data'
    so GSPMD partitions the generator forward across the slice — the
    inference pipelines scale like training does (train/loops.py).

    cache=(anchor, key): reuse ONE jitted scan program per (anchor, key)
    — `key` must capture everything `step`'s behaviour depends on beyond
    the array arguments (stage tag, hist weight, shapes, mesh identity),
    because the first call's `step` closure is the one that stays
    compiled."""
    constraint = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gan_danet_tpu.core.meshes import DATA_AXIS

        constraint = NamedSharding(mesh, P(DATA_AXIS))
        rep = NamedSharding(mesh, P())
        # device_put on the (possibly already device-resident) arrays is a
        # device-to-device reshard — no host round-trip
        arrs = {k: jax.device_put(v, rep) for k, v in arrs.items()}
    nb = -(-n // batch_size)
    idx = jnp.asarray(np.resize(np.arange(n), nb * batch_size)
                      .reshape(nb, batch_size))

    def run_fn(arrs_, idx_):
        def body(_, ids):
            batch = {k: jnp.take(v, ids, axis=0) for k, v in arrs_.items()}
            if constraint is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, {k: constraint for k in batch})
            return None, step(batch)

        _, outs = jax.lax.scan(body, None, idx_)      # (nb, B, H, W, 1)
        return outs

    runner = run_fn
    if cache is not None:
        anchor, key = cache
        per = getattr(anchor, _SCAN_CACHE_ATTR, None)
        if per is None:
            try:
                per = {}
                setattr(anchor, _SCAN_CACHE_ATTR, per)
            except AttributeError:  # slotted/builtin callable: no caching
                per = None
        if per is not None:
            if key not in per:
                per[key] = jax.jit(run_fn)
            runner = per[key]
    outs = runner(arrs, idx)
    outs = outs.reshape(-1, *outs.shape[2:4])[:n]
    return np.asarray(outs) if to_host else outs


def _pearson(a: np.ndarray, b: np.ndarray) -> float:
    try:
        from scipy.stats import pearsonr

        return float(pearsonr(a, b)[0])
    except ImportError:  # pragma: no cover
        return float(np.corrcoef(a, b)[0, 1])


@dataclass
class Stage1Result:
    pred: np.ndarray          # (T, H25, W25) physical units, masked (nan)
    truth: np.ndarray         # (T, H25, W25)
    bias_high: np.ndarray     # (T, 4H, 4W) nearest-upsampled truth-pred
    series_pred: np.ndarray
    series_truth: np.ndarray
    pearson_r: float


def predict_025(
    apply_fn,
    data,
    mask_high: np.ndarray,
    batch_size: int = 8,
    hist_weight: float = 0.2,
    export_dir: Optional[str] = None,
    mesh=None,
) -> Stage1Result:
    """`apply_fn(x: (B,H/4,W/4,46)) -> (B,H,W,1)` — build one with
    `make_apply_fn(generator, params, batch_stats)`."""
    ([lr05, trend05], [lr025, trend25], hr_aux, _s05, s025, _sa) = data
    h25, w25 = lr025.shape[1:3]
    coarse_hw = (h25 // 4, w25 // 4)

    def step(batch):
        x = build_inputs(batch, coarse_hw)
        # post-processing in f32 regardless of the model's compute dtype
        pred = apply_fn(x).astype(jnp.float32)
        return batched_histogram_match(pred, batch["lr025"], hist_weight)

    arrs = {"lr05": jnp.asarray(lr05[..., None]),
            "lr025": jnp.asarray(lr025[..., None]),
            "aux": jnp.asarray(hr_aux)}
    # CACHE CONTRACT: every value `step` closes over (beyond array args
    # covered by jit retracing) MUST appear in this key — a missing entry
    # silently serves a stale compiled program
    cache_key = ("s1", float(hist_weight), coarse_hw, _mesh_key(mesh))
    res = _scan_batches(step, arrs, lr05.shape[0], batch_size, mesh=mesh,
                        cache=(apply_fn, cache_key))

    res = res + trend25
    truth = lr025 + trend25
    stats = as_scaler_stats(s025)
    res = stats.inverse_transform(res)
    truth = stats.inverse_transform(truth)

    res = np.where(mask_high[None] > 0, res, np.nan)
    truth = np.where(mask_high[None] > 0, truth, np.nan)

    bias = truth - res
    bias_high = np.repeat(np.repeat(bias, 4, axis=1), 4, axis=2)

    series_pred = np.nanmean(res, axis=(1, 2))
    series_truth = np.nanmean(truth, axis=(1, 2))
    r = _pearson(series_pred, series_truth)

    if export_dir is not None:
        d = Path(export_dir)
        d.mkdir(parents=True, exist_ok=True)
        exp.write_h5(d / "grace025.h5", truth)
        # faithful quirk: grace05.h5 is saved in standardized units
        exp.write_h5(d / "grace05.h5", lr05 + trend05)
        exp.write_h5(d / "biash.h5", bias_high)
        exp.write_h5(d / "valid.h5", res)

    return Stage1Result(res, truth, bias_high, series_pred, series_truth, r)


@dataclass
class Stage2Result:
    pred_cm: np.ndarray       # (T, H005, W005) cm, masked, bias-corrected
    truth_025: np.ndarray     # (T, H25, W25) physical units, masked
    series_pred_cm: np.ndarray
    series_truth: np.ndarray
    pearson_r: float


def predict_005(
    apply_fn,
    data,
    mask_high: np.ndarray,
    bias_high: Optional[np.ndarray] = None,
    uncertainty: Optional[np.ndarray] = None,
    stage1_series: Optional[np.ndarray] = None,
    batch_size: int = 4,
    hist_weight: float = 0.0,
    blend_region: Optional[Tuple[int, int, int, int]] = None,
    blend_sigma: int = 5,
    export_dir: Optional[str] = None,
    mesh=None,
) -> Stage2Result:
    ([_lr05, _t05], [lr025, trend25], hr_aux, _s05, s025, _sa) = data
    h25, w25 = lr025.shape[1:3]
    if blend_region is None:
        # reference region (0,90,0,44) in its (lon,lat) layout == rows
        # 0:44, cols 0:90 here, scaled to the configured grid
        blend_region = (0, h25 // 2, 0, w25 // 2)
    h005, w005 = 5 * h25, 5 * w25

    def step(batch):
        xin = jnp.concatenate([batch["lr025"], batch["aux"]], axis=-1)
        pred = apply_fn(xin).astype(jnp.float32)      # (B, 4H, 4W, 1)
        pred = resize2d(pred, (h005, w005), "bicubic")
        pred = batched_histogram_match(pred, batch["lr025"], hist_weight)
        hr_grace = resize2d(batch["lr025"], (4 * h25, 4 * w25), "bicubic")
        return smooth_blend(pred, hr_grace, blend_region, blend_sigma)

    arrs = {"lr025": jnp.asarray(lr025[..., None]),
            "aux": jnp.asarray(hr_aux)}
    # the full post-processing chain (trend re-add -> inverse scale -> cm
    # -> mask -> bias correction -> uncertainty zoom) stays DEVICE-
    # resident; only the exported products come back to host (one ~300 MB
    # pull each at reference scale — per-stage round-trips measured 2.7x
    # slower over the tunneled chip, VALIDATION.md)
    from gan_danet_tpu.ops.resize import spline_zoom2d

    # CACHE CONTRACT: see predict_025 — every step-closure dependency
    # must be in the key
    cache_key = ("s2", float(hist_weight), (h005, w005),
                 tuple(blend_region), int(blend_sigma), _mesh_key(mesh))
    res_dev = _scan_batches(step, arrs, lr025.shape[0], batch_size,
                            to_host=False, mesh=mesh,
                            cache=(apply_fn, cache_key))
    trend_ups = spline_zoom2d(jnp.asarray(trend25, jnp.float32),
                              (h005, w005), order=3)
    res_dev = res_dev + trend_ups
    truth = lr025 + trend25

    stats = as_scaler_stats(s025)
    res_dev = stats.inverse_transform(res_dev)   # jit/device-friendly
    truth = stats.inverse_transform(truth)

    res_cm_dev = res_dev * 10.0
    mask_hi_dev = spline_zoom2d(jnp.asarray(mask_high, jnp.float32),
                                (h005, w005), order=1)
    res_cm_dev = jnp.where(mask_hi_dev[None] > 0, res_cm_dev, jnp.nan)
    truth = np.where(mask_high[None] > 0, truth, np.nan)

    # EXPORT-TAIL OVERLAP (round 5; warm stage-2 was 64 s of which ~40 s
    # was serialized pulls + writes — VALIDATION.md breakdown: each
    # (181,440,900) pull is ~7 s over the tunnel, each h5/nc write 2-5 s
    # of host gzip/IO): (1) dispatch ALL remaining device programs
    # (bias-add, uncertainty zoom+mask, series nanmeans) before the first
    # blocking pull, so they compute during the transfers; (2) run the
    # product writes on background threads so host IO overlaps the next
    # pull (h5py serialises its own calls under a global lock, but writes
    # still overlap the GIL-releasing device transfers).
    import threading

    write_errors: list = []
    writer_threads: list = []

    def _bg(fn, *args):
        def run():
            try:
                fn(*args)
            except Exception as e:  # propagate after join
                write_errors.append(e)

        t = threading.Thread(target=run)
        t.start()
        writer_threads.append(t)

    bias_applied = bias_high is not None
    if bias_applied:
        # the bias grid is NaN outside the plateau mask; order-3 spline
        # zoom would propagate NaN across the whole array — zero-fill first
        # (bias correction only matters inside the mask anyway)
        bias_filled = np.nan_to_num(bias_high, nan=0.0)
        final_dev = res_cm_dev + spline_zoom2d(
            jnp.asarray(bias_filled, jnp.float32), (h005, w005), order=3)
    else:
        final_dev = res_cm_dev

    unc05_dev = None
    if export_dir is not None and uncertainty is not None:
        unc05_dev = jnp.where(
            mask_hi_dev[None] > 0,
            spline_zoom2d(jnp.asarray(uncertainty, jnp.float32),
                          (h005, w005), order=0),
            jnp.nan)
    # spatial-mean series on DEVICE: a (T,) pull instead of a host nanmean
    # over the 293 MB cube
    series_dev = jnp.nanmean(final_dev, axis=(1, 2))
    unc_series_dev = (jnp.nanmean(unc05_dev, axis=(1, 2))
                      if unc05_dev is not None else None)

    raw_cm = None
    if export_dir is not None:
        Path(export_dir).mkdir(parents=True, exist_ok=True)
        if bias_applied:
            raw_cm = np.asarray(res_cm_dev)   # overlaps the final/unc computes
            _bg(exp.write_h5, Path(export_dir) / "raw_downscaled.h5", raw_cm)

    res_cm = np.asarray(final_dev)
    if export_dir is not None and not bias_applied:
        # without a bias correction the raw product IS the final cube —
        # reuse the one pull instead of a second ~300 MB transfer
        raw_cm = res_cm
        _bg(exp.write_h5, Path(export_dir) / "raw_downscaled.h5", raw_cm)

    series_pred = np.asarray(series_dev)
    series_truth = np.nanmean(truth, axis=(1, 2))
    r = _pearson(series_pred, series_truth)

    if export_dir is not None:
        d = Path(export_dir)
        _bg(exp.write_h5, d / "downscaled.h5", res_cm)
        _bg(exp.export_nc_025, d / "grace_025.nc", truth * 10.0)
        unc05 = np.asarray(unc05_dev) if unc05_dev is not None else None
        exp.write_timeseries_csv(
            d / "timeseries_tp.csv", series_pred, series_truth,
            series_025_pred=stage1_series,
            unc_005=(np.asarray(unc_series_dev)
                     if unc_series_dev is not None else None),
            unc_025=(np.nanmean(uncertainty, axis=(1, 2))
                     if uncertainty is not None else None),
        )
        exp.export_nc_005(
            d / "downscaled_grace_tws_data_with_uncertainty_gan_danet.nc",
            res_cm, uncertainty=unc05)
        for t in writer_threads:
            t.join()
        if write_errors:
            raise write_errors[0]

    return Stage2Result(res_cm, truth, series_pred, series_truth, r)
