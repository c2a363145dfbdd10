"""Raw ingest: NetCDF directory readers against files written by our own
NC writer (NetCDF4/HDF5) and scipy (classic NetCDF3), plus the .npy raw
loader path."""
import numpy as np
import pytest

from gan_danet_tpu.core.config import DataConfig
from gan_danet_tpu.data.ncio import NCWriter, read_nc
from gan_danet_tpu.data.readers import (
    load_raw_from_files,
    read_era5_directory,
    read_grace_directory,
)


def _write_nc4(path, arrays, dims):
    with NCWriter(path) as nc:
        for name, (dnames, data) in arrays.items():
            nc.create_variable(name, dnames, data)
    del dims


def _write_nc3(path, var_arrays, time):
    from scipy.io import netcdf_file

    with netcdf_file(path, "w") as f:
        first = next(iter(var_arrays.values()))
        f.createDimension("time", first.shape[0])
        f.createDimension("y", first.shape[1])
        f.createDimension("x", first.shape[2])
        tv = f.createVariable("time", "f4", ("time",))
        tv[:] = time
        for name, arr in var_arrays.items():
            v = f.createVariable(name, "f4", ("time", "y", "x"))
            v[:] = arr


def test_grace_directory_nc4(tmp_path, rng):
    for i in range(3):
        arr = rng.standard_normal((2, 6, 8)).astype(np.float32)
        _write_nc4(tmp_path / f"grace_{i}.nc",
                   {"twsan": (("time", "lat", "lon"), arr),
                    "time": (("time",), np.arange(2 * i, 2 * i + 2))},
                   None)
    data, time = read_grace_directory(tmp_path)
    assert data.shape == (6, 6, 8)
    assert len(time) == 6


def test_grace_heuristic_branch(tmp_path, rng):
    big = rng.standard_normal((1, 120, 100)).astype(np.float32)  # >10000 elems
    _write_nc4(tmp_path / "mystery.nc", {"lwe": (("time", "a", "b"), big)}, None)
    data, _ = read_grace_directory(tmp_path)
    assert data.shape == (1, 120, 100)


def test_era5_directory_nc3(tmp_path, rng):
    for i in range(2):
        arrs = {v: rng.standard_normal((3, 10, 12)).astype(np.float32)
                for v in ("t2m", "e", "ro", "sde", "tp")}
        _write_nc3(tmp_path / f"era_{i}.nc", arrs, np.arange(3 * i, 3 * i + 3))
    data, time = read_era5_directory(tmp_path)
    assert set(data) == {"t2m", "e", "ro", "sde", "tp"}
    assert data["t2m"].shape == (6, 10, 12)
    assert len(time) == 6


def test_nc3_scale_offset_applied(tmp_path):
    from scipy.io import netcdf_file

    with netcdf_file(tmp_path / "packed.nc", "w") as f:
        f.createDimension("x", 4)
        v = f.createVariable("v", "h", ("x",))
        v[:] = np.array([0, 1, 2, 3], dtype=np.int16)
        v.scale_factor = 0.5
        v.add_offset = 10.0
    variables, _ = read_nc(tmp_path / "packed.nc")
    np.testing.assert_allclose(variables["v"], [10.0, 10.5, 11.0, 11.5])


def test_load_raw_from_files(tmp_path, rng):
    t, (h5, w5), (h25, w25) = 8, (4, 6), (8, 12)
    np.save(tmp_path / "qz_rlwe-05.npy",
            rng.standard_normal((t, h5, w5)).astype(np.float32))
    np.save(tmp_path / "qz_rlwe-25.npy",
            rng.standard_normal((t + 2, h25, w25)).astype(np.float32))
    np.save(tmp_path / "gldas25.npy",
            rng.standard_normal((t + 19, h25, w25, 36)).astype(np.float32))
    np.save(tmp_path / "dem.npy",
            rng.standard_normal((h25, w25)).astype(np.float32))
    for f in ("qz_ht-1.npy", "qz_het-1.npy", "qz_hp-1.npy", "qz_hro-1.npy",
              "qz_hsde-1.npy", "qz_htp-1.npy"):
        np.save(tmp_path / f, rng.standard_normal((t, h25, w25)).astype(np.float32))

    cfg = DataConfig(project_dir=str(tmp_path), n_time=t,
                     grid_05=(h5, w5), grid_025=(h25, w25))
    raw = load_raw_from_files(cfg)
    assert raw.grace_05.shape == (t, h5, w5)
    assert raw.grace_025.shape == (t, h25, w25)
    assert raw.gldas.shape == (t, h25, w25, 36)
    assert raw.era5.shape == (t, h25, w25, 6)
    assert raw.mask_high.shape == (h25, w25)  # default all-ones fallback


def test_raw_feeds_pipeline(tmp_path, rng):
    """The npy-file path must flow through load_data unchanged."""
    from gan_danet_tpu.data.pipeline import load_data

    t, (h5, w5), (h25, w25) = 24, (8, 10), (16, 20)
    np.save(tmp_path / "qz_rlwe-05.npy",
            rng.standard_normal((t, h5, w5)).astype(np.float32))
    np.save(tmp_path / "qz_rlwe-25.npy",
            rng.standard_normal((t, h25, w25)).astype(np.float32))
    np.save(tmp_path / "gldas25.npy",
            rng.standard_normal((t + 19, h25, w25, 36)).astype(np.float32))
    np.save(tmp_path / "dem.npy",
            rng.standard_normal((h25, w25)).astype(np.float32))
    for f in ("qz_ht-1.npy", "qz_het-1.npy", "qz_hp-1.npy", "qz_hro-1.npy",
              "qz_hsde-1.npy", "qz_htp-1.npy"):
        np.save(tmp_path / f, rng.standard_normal((t, h25, w25)).astype(np.float32))
    cfg = DataConfig(project_dir=str(tmp_path), n_time=t,
                     grid_05=(h5, w5), grid_025=(h25, w25))
    ([d05, t05], [d25, t25], aux, *_s) = load_data(cfg)
    assert aux.shape == (t, h25, w25, 45)


def test_dress_rehearsal_tree_roundtrip(tmp_path):
    """scripts/dress_rehearsal.build_tree at tiny scale: GRACE read from
    NetCDF DIRECTORIES (the win.py branch — no npys on disk), masks from
    their (lon,lat)-transposed files, and the ERA5 channels from 0.1deg
    NetCDF files through read_era's [15:T+15] slice + reorientation +
    cubic 0.4 zoom — the full file-ingest plumbing the round-5 full-scale
    rehearsal exercised (VALIDATION.md), locked into CI."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
    from scripts.dress_rehearsal import build_tree

    from gan_danet_tpu.data.synthetic import make_synthetic_raw, tiny_config

    dc = tiny_config(24)
    build_tree(tmp_path, seed=0, config=dc)
    assert not (tmp_path / "project" / "qz_rlwe-05.npy").exists()
    assert (tmp_path / "project" / "qz_rlwe-05").is_dir()

    cfg = DataConfig(project_dir=str(tmp_path / "project"),
                     data_dir=str(tmp_path / "data"), era5_subdir="ERA5/11",
                     n_time=dc.n_time, grid_05=dc.grid_05,
                     grid_025=dc.grid_025)
    raw = load_raw_from_files(cfg)
    ref = make_synthetic_raw(dc, seed=0)
    np.testing.assert_allclose(raw.grace_05, ref.grace_05, rtol=1e-6)
    np.testing.assert_allclose(raw.grace_025, ref.grace_025, rtol=1e-6)
    np.testing.assert_array_equal(raw.mask_high, ref.mask_high)
    np.testing.assert_array_equal(raw.mask_low, ref.mask_low)
    np.testing.assert_allclose(raw.gldas, ref.gldas, rtol=1e-6)
    # ERA5 goes through a 2.5x-up / 0.4x-down zoom round trip: not exact,
    # but each ingested channel must track its generating field closely
    for ch in (0, 1, 3, 4, 5):
        a, b = raw.era5[..., ch].ravel(), ref.era5[..., ch].ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.98, f"era5 channel {ch}"
