"""Preprocessed-data cache, byte-compatible with the reference contract
(GAN_DANet_train.ipynb cell 0, `_save_data_cache` / `_load_data_cache`):

  cache/dataset_cache.npz       float32 keys: lr_grace_05, trend05,
                                lr_grace_025, trend25, hr_aux
  cache/grace_scaler_05.joblib
  cache/grace_scaler_025.joblib
  cache/aux_scalers.joblib

A real reference cache (with pickled sklearn scalers) loads unchanged —
this is the interop boundary for parity checks (SURVEY.md §7).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np

try:
    import joblib
except ImportError:  # pragma: no cover
    joblib = None

CACHE_FILE = "dataset_cache.npz"
SCALER_05_FILE = "grace_scaler_05.joblib"
SCALER_025_FILE = "grace_scaler_025.joblib"
AUX_SCALERS_FILE = "aux_scalers.joblib"


def cache_exists(cache_dir) -> bool:
    d = Path(cache_dir)
    return all(
        (d / f).exists()
        for f in (CACHE_FILE, SCALER_05_FILE, SCALER_025_FILE, AUX_SCALERS_FILE)
    )


def save_cache(cache_dir, lr05, trend05, lr025, trend25, hr_aux,
               scaler05, scaler025, aux_scalers) -> None:
    d = Path(cache_dir)
    d.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        d / CACHE_FILE,
        lr_grace_05=np.asarray(lr05, dtype=np.float32),
        trend05=np.asarray(trend05, dtype=np.float32),
        lr_grace_025=np.asarray(lr025, dtype=np.float32),
        trend25=np.asarray(trend25, dtype=np.float32),
        hr_aux=np.asarray(hr_aux, dtype=np.float32),
    )
    if joblib is None:
        raise RuntimeError("joblib required to write scaler cache")
    joblib.dump(scaler05, d / SCALER_05_FILE, compress=3)
    joblib.dump(scaler025, d / SCALER_025_FILE, compress=3)
    joblib.dump(aux_scalers, d / AUX_SCALERS_FILE, compress=3)


def load_cache(cache_dir) -> Tuple[List[np.ndarray], List[np.ndarray], np.ndarray, object, object, list]:
    d = Path(cache_dir)
    with np.load(d / CACHE_FILE) as z:
        lr05 = z["lr_grace_05"]
        trend05 = z["trend05"]
        lr025 = z["lr_grace_025"]
        trend25 = z["trend25"]
        hr_aux = z["hr_aux"]
    if joblib is None:
        raise RuntimeError("joblib required to read scaler cache")
    scaler05 = joblib.load(d / SCALER_05_FILE)
    scaler025 = joblib.load(d / SCALER_025_FILE)
    aux_scalers = joblib.load(d / AUX_SCALERS_FILE)
    return [lr05, trend05], [lr025, trend25], hr_aux, scaler05, scaler025, aux_scalers
