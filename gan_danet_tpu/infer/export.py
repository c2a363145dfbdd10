"""Product exporters (reference test.ipynb cells 1 & 3): HDF5 blobs, CF-ish
NetCDF4 files (via the h5py-backed writer), and the time-series CSV.

Faithful quirks preserved: the NetCDF data arrays are stored transposed to
(time, lon, lat); the 0.05deg grid starts at 24.025N/65.025E with 0.05
steps; time is 'days since 2002-08-01' at 30-day spacing.
"""
from __future__ import annotations

from datetime import date
from pathlib import Path
from typing import Optional

import numpy as np

from gan_danet_tpu.data.ncio import NCWriter


def write_h5(path, data: np.ndarray, name: str = "data") -> None:
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset(name, data=np.asarray(data))


def read_h5(path, name: str = "data") -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        return f[name][:]


def _time_days(n: int) -> np.ndarray:
    return np.arange(n, dtype=np.float32) * 30.0


def export_nc_005(
    path,
    data_cm: np.ndarray,                 # (T, lat, lon) cm
    uncertainty: Optional[np.ndarray] = None,
    start_lat: float = 24.025,
    start_lon: float = 65.025,
    step: float = 0.05,
) -> None:
    t, nlat, nlon = data_cm.shape
    with NCWriter(path) as nc:
        nc.create_dimension("time", t)
        nc.create_dimension("lat", nlat)
        nc.create_dimension("lon", nlon)
        nc.create_variable("time", ("time",), _time_days(t),
                           attrs={"units": "days since 2002-08-01",
                                  "calendar": "standard"})
        nc.create_variable("lat", ("lat",),
                           start_lat + step * np.arange(nlat),
                           attrs={"units": "degrees_north"})
        nc.create_variable("lon", ("lon",),
                           start_lon + step * np.arange(nlon),
                           attrs={"units": "degrees_east"})
        nc.create_variable(
            "data", ("time", "lon", "lat"),
            np.transpose(data_cm, (0, 2, 1)), zlib=True,
            attrs={
                "units": "cm",
                "source": "GRACE/GRACE-FO CSR Mascon RL06",
                "description": "Downscaled GRACE TWSA with uncertainty (GAN-DANet)",
                "spatial_resolution": "0.05deg",
                "original_resolution": "0.25deg",
            })
        if uncertainty is not None:
            nc.create_variable("uncertainty", ("time", "lon", "lat"),
                               np.transpose(uncertainty, (0, 2, 1)), zlib=True)
        nc.set_attrs(
            model="GAN-DANet",
            date_created=date.today().isoformat(),
            file_description="Downscaled TWSA with associated uncertainty.",
            uncertainty_method="Averaged across ensemble predictions.",
            time_period="2002-08 to end of dataset",
        )


def export_nc_025(
    path,
    data_cm: np.ndarray,                 # (T, lat, lon) cm
    start_lat: float = 24.125,
    start_lon: float = 65.125,
    step: float = 0.25,
) -> None:
    t, nlat, nlon = data_cm.shape
    with NCWriter(path) as nc:
        nc.create_dimension("time", t)
        nc.create_dimension("lat", nlat)
        nc.create_dimension("lon", nlon)
        nc.create_variable("time", ("time",), _time_days(t),
                           attrs={"units": "days since 2002-08-01",
                                  "calendar": "standard"})
        nc.create_variable("lat", ("lat",),
                           start_lat + step * np.arange(nlat),
                           attrs={"units": "degrees_north"})
        nc.create_variable("lon", ("lon",),
                           start_lon + step * np.arange(nlon),
                           attrs={"units": "degrees_east"})
        nc.create_variable(
            "data", ("time", "lon", "lat"),
            np.transpose(data_cm, (0, 2, 1)), zlib=True,
            attrs={"units": "cm",
                   "source": "GRACE/GRACE-FO CSR Mascon RL06",
                   "description": "GRACE TWSA at 0.25deg (cm)"})
        nc.set_attrs(
            date_created=date.today().isoformat(),
            file_description="GRACE 0.25deg TWSA for comparison.",
            time_period="2002-08 to end of dataset",
        )


def write_timeseries_csv(
    path,
    series_005_cm: np.ndarray,
    series_025_truth: np.ndarray,
    series_025_pred: Optional[np.ndarray] = None,
    unc_005: Optional[np.ndarray] = None,
    unc_025: Optional[np.ndarray] = None,
) -> None:
    """timeseries_tp.csv (reference test.ipynb cell 3): monthly dates from
    2002-08, GRACE/downscaled series in cm."""
    import pandas as pd

    n = len(series_005_cm)
    dates = pd.date_range(start="2002-08", periods=n, freq="ME")
    cols = {
        "Date": dates,
        "GRACE025": series_025_truth * 10.0,
        "Downscaled005": series_005_cm,
    }
    if unc_005 is not None:
        cols["uncertainty_005"] = unc_005
    if series_025_pred is not None:
        cols["Downscaled025"] = series_025_pred * 10.0
    if unc_025 is not None:
        cols["uncertainty_025"] = unc_025 * 10.0
    pd.DataFrame(cols).to_csv(path, index=False)
