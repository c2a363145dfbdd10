"""NetCDF I/O without the netCDF4 library.

The reference reads NetCDF with netCDF4/xarray (NC_READ.py, win.py) and
writes NETCDF4 products (test.ipynb cell 3). Neither netCDF4 nor xarray is
available in this image, so this module provides:

  * `NCWriter` — writes NetCDF4-compatible files through h5py (NetCDF4 IS
    HDF5 + dimension-scale conventions), with zlib compression and
    attributes, readable by netCDF4/xarray/h5netcdf.
  * `read_nc` — reads both NetCDF4 (via h5py) and classic NetCDF3 (via
    scipy.io.netcdf_file), returning {var: array} + attrs.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


class NCWriter:
    """Minimal NetCDF4 writer.

    Usage:
        with NCWriter(path) as nc:
            nc.create_dimension('time', t)
            nc.create_variable('data', ('time','lat','lon'), arr, zlib=True,
                               attrs={'units': 'cm'})
            nc.set_attrs(model='GAN-DANet')
    """

    def __init__(self, path):
        import h5py

        self._h5 = h5py.File(path, "w")
        self._dims: Dict[str, int] = {}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def create_dimension(self, name: str, size: int) -> None:
        self._dims[name] = size
        if name not in self._h5:
            # placeholder coordinate (dimension scale); may be overwritten
            # by a same-named variable
            ds = self._h5.create_dataset(name, shape=(size,), dtype="f4")
            ds.make_scale(name)
            ds.attrs["_Netcdf4Dimid"] = np.int32(len(self._dims) - 1)

    def create_variable(
        self,
        name: str,
        dims: Sequence[str],
        data: np.ndarray,
        zlib: bool = False,
        attrs: Optional[Dict] = None,
        dtype="f4",
    ) -> None:
        data = np.asarray(data)
        for d, s in zip(dims, data.shape):
            if d not in self._dims:
                self.create_dimension(d, s)
            if self._dims[d] != s:
                raise ValueError(f"dim {d}: {s} != declared {self._dims[d]}")

        if name in self._dims:
            # coordinate variable: fill the existing scale dataset
            self._h5[name][...] = data.astype(dtype)
            ds = self._h5[name]
        else:
            kw = {"compression": "gzip", "compression_opts": 4} if zlib else {}
            ds = self._h5.create_dataset(name, data=data.astype(dtype), **kw)
            for i, d in enumerate(dims):
                ds.dims[i].attach_scale(self._h5[d])
        for k, v in (attrs or {}).items():
            ds.attrs[k] = v

    def set_attrs(self, **attrs) -> None:
        for k, v in attrs.items():
            self._h5.attrs[k] = v

    def close(self) -> None:
        self._h5.close()


def _read_nc4(path) -> Tuple[Dict[str, np.ndarray], Dict]:
    import h5py

    out, attrs = {}, {}
    with h5py.File(path, "r") as f:
        attrs.update({k: f.attrs[k] for k in f.attrs})

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = obj[...]

        f.visititems(visit)
    return out, attrs


def _read_nc3(path) -> Tuple[Dict[str, np.ndarray], Dict]:
    from scipy.io import netcdf_file

    out, attrs = {}, {}
    with netcdf_file(path, "r", mmap=False) as f:
        for k, v in f.variables.items():
            arr = np.array(v[:])
            # apply CF scale/offset if present (netCDF4 does this
            # automatically; scipy does not)
            sf = getattr(v, "scale_factor", None)
            ao = getattr(v, "add_offset", None)
            fv = getattr(v, "_FillValue", None) or getattr(v, "missing_value", None)
            if fv is not None and np.issubdtype(arr.dtype, np.integer):
                bad = arr == fv
            else:
                bad = None
            if sf is not None or ao is not None:
                arr = arr.astype(np.float64) * (sf if sf is not None else 1.0) \
                    + (ao if ao is not None else 0.0)
            if bad is not None:
                arr = np.where(bad, np.nan, arr)
            out[k] = arr
        attrs = {k: getattr(f, k) for k in getattr(f, "_attributes", {})}
    return out, attrs


def read_nc(path) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Read any .nc file: tries HDF5 (NetCDF4) first, falls back to
    classic NetCDF3."""
    path = Path(path)
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic.startswith(b"\x89HDF"):
        return _read_nc4(path)
    if magic.startswith(b"CDF"):
        return _read_nc3(path)
    raise ValueError(f"{path}: not a NetCDF file (magic {magic!r})")
