"""Raw NetCDF/npy ingest (behavioural parity: NC_READ.py, win.py, and
datasets.py `read_era`/`load_data` file plumbing), using the h5py/scipy
NetCDF backends in data/ncio.py (netCDF4/xarray are unavailable here).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from gan_danet_tpu.core.config import DataConfig
from gan_danet_tpu.data.ncio import read_nc
from gan_danet_tpu.data.synthetic import RawArrays


def _nc_files(directory) -> list:
    d = Path(directory)
    return sorted(p for p in d.iterdir()
                  if p.suffix.lower() in (".nc", ".nc4"))


def read_grace_directory(directory, var: str = "twsan"):
    """GRACE TWSA reader (win.py:16-33): read `var` + time from every file,
    concatenate along time -> ((T, lat, lon), time). Falls back to the
    heuristic branch (win.py:34-88): first variable with > 10000 elements."""
    chunks, times = [], []
    for path in _nc_files(directory):
        variables, _ = read_nc(path)
        if var in variables:
            arr = np.asarray(variables[var])
        else:
            candidates = [v for k, v in variables.items()
                          if np.asarray(v).size > 10000]
            if not candidates:
                continue
            arr = np.asarray(candidates[0])
        if arr.ndim == 2:
            arr = arr[None]
        chunks.append(arr.astype(np.float32))
        t = variables.get("time")
        times.append(np.atleast_1d(t) if t is not None
                     else np.arange(arr.shape[0]))
    if not chunks:
        raise FileNotFoundError(f"no usable NetCDF variables in {directory}")
    return np.concatenate(chunks, axis=0), np.concatenate(times)


def read_era5_directory(directory) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """ERA5 directory reader (NC_READ.py:15-64): per-variable concat along
    the LEADING time axis, invalid values masked to NaN, time collected."""
    data: Dict[str, list] = {}
    times = []
    for path in _nc_files(directory):
        variables, _ = read_nc(path)
        t = variables.pop("time", None)
        for k in ("lat", "lon", "latitude", "longitude", "expver"):
            variables.pop(k, None)
        for name, arr in variables.items():
            arr = np.asarray(arr, dtype=np.float32)
            arr = np.where(np.abs(arr) > 1e15, np.nan, arr)
            data.setdefault(name, []).append(arr)
        if t is not None:
            times.append(np.atleast_1d(t))
    out = {k: np.concatenate(v, axis=0) for k, v in data.items()}
    time = np.concatenate(times) if times else np.array([])
    return out, time


def read_era_channels(config: DataConfig, n_time: Optional[int] = None) -> np.ndarray:
    """datasets.py `read_era` equivalent: pull t2m/e/ro/sde/tp from the
    ERA5 directory, align to the GRACE window with the [15 : T+15] offset,
    reorient (transpose + rot90 k=3), cubic-zoom 0.1deg -> 0.25deg
    (factors 0.4), and stack the 6 derived channels (t2m, et, p, ro, sde,
    tp) as (T, H, W, 6). The precipitation channel duplicates tp when no
    separate product exists (the reference loads a precomputed qz_hp npy)."""
    from scipy.ndimage import zoom

    era5_dir = Path(config.data_dir) / config.era5_subdir
    era5, _time = read_era5_directory(era5_dir)
    t = n_time or config.n_time

    def prep(name):
        arr = np.squeeze(era5[name])[15 : t + 15]        # (T, y, x)
        arr = np.transpose(arr, (1, 2, 0))               # (y, x, T)
        arr = np.rot90(arr, k=3, axes=(0, 1))            # reorient
        arr = np.transpose(arr, (2, 0, 1))               # (T, y, x)
        return zoom(arr, (1, 0.4, 0.4), order=3, mode="nearest")

    t2m = prep("t2m")
    et = prep("e")
    ro = prep("ro")
    sde = prep("sde")
    tp = prep("tp")
    precip = tp  # stand-in for the precomputed qz_hp product
    return np.stack([t2m, et, precip, ro, sde, tp], axis=-1).astype(np.float32)


def load_raw_from_files(config: DataConfig) -> RawArrays:
    """Assemble RawArrays from the reference's on-disk layout
    (datasets.py:27-42 env-var contract): .npy GRACE/GLDAS/DEM/mask inputs
    plus ERA5-derived channels (precomputed qz_*-1.npy intermediates when
    present, else regenerated from the ERA5 NetCDF directory)."""
    proj = Path(config.project_dir)

    def load_grace(name: str) -> np.ndarray:
        """Precomputed .npy when present; otherwise read a GRACE NetCDF
        DIRECTORY of the same stem (win.py readdata parity — the
        reference ran win.py by hand to produce the npys; here the
        directory branch is wired straight into ingest)."""
        p = proj / name
        if p.exists():
            return np.load(p).astype(np.float32)
        d = p.with_suffix("")
        if d.is_dir():
            arr, _time = read_grace_directory(d)
            return arr.astype(np.float32)
        raise FileNotFoundError(
            f"neither {p} nor a GRACE NetCDF directory {d} exists")

    grace_05 = load_grace(config.qz_rlwe_05)
    grace_025 = load_grace(config.qz_rlwe_25)
    grace_025 = grace_025[: grace_05.shape[0]]
    t = grace_05.shape[0]

    gldas = np.load(proj / config.gldas25).astype(np.float32)
    gldas = gldas[19:]  # reference slice (datasets.py:376)
    dem = np.load(proj / config.dem_npy).astype(np.float32)
    if dem.ndim == 3:
        dem = dem[..., 0]

    intermediates = ["qz_ht-1.npy", "qz_het-1.npy", "qz_hp-1.npy",
                     "qz_hro-1.npy", "qz_hsde-1.npy", "qz_htp-1.npy"]
    if all((proj / f).exists() for f in intermediates):
        era5 = np.stack(
            [np.load(proj / f)[:t].astype(np.float32) for f in intermediates],
            axis=-1)
    else:
        era5 = read_era_channels(config, n_time=t)

    def load_mask(name, shape):
        p = proj / name
        if p.exists():
            return np.load(p).astype(np.float32)
        return np.ones(shape, np.float32)

    mask_low = load_mask(config.mask_low, config.grid_05)
    mask_high = load_mask(config.mask_high, config.grid_025)
    # masks may be stored (lon, lat); reorient to (lat, lon)
    if mask_low.shape == config.grid_05[::-1]:
        mask_low = mask_low.T
    if mask_high.shape == config.grid_025[::-1]:
        mask_high = mask_high.T

    return RawArrays(
        grace_05=grace_05,
        grace_025=grace_025,
        gldas=gldas[:t],
        era5=era5[:t],
        dem=dem,
        mask_low=mask_low,
        mask_high=mask_high,
    )
