"""Evaluation metrics (reference utils.py:75-80 `evaluate_metrics` and the
NSE/MAE/RMSE/CC set from AE.ipynb `_calculate_metrics`), NaN-aware."""
from __future__ import annotations

from typing import Dict

import numpy as np


def _clean(pred, true):
    p = np.asarray(pred, dtype=np.float64).ravel()
    t = np.asarray(true, dtype=np.float64).ravel()
    ok = np.isfinite(p) & np.isfinite(t)
    return p[ok], t[ok]


def mse(pred, true) -> float:
    p, t = _clean(pred, true)
    return float(np.mean((p - t) ** 2))


def rmse(pred, true) -> float:
    return float(np.sqrt(mse(pred, true)))


def mae(pred, true) -> float:
    p, t = _clean(pred, true)
    return float(np.mean(np.abs(p - t)))


def r2_score(pred, true) -> float:
    p, t = _clean(pred, true)
    ss_res = np.sum((t - p) ** 2)
    ss_tot = np.sum((t - t.mean()) ** 2)
    return float(1.0 - ss_res / ss_tot) if ss_tot > 0 else 0.0


def nse(pred, true) -> float:
    """Nash-Sutcliffe efficiency (identical formula to r2 against the
    observed mean; kept separately for hydrology-audience parity)."""
    return r2_score(pred, true)


def pearson_r(pred, true) -> float:
    p, t = _clean(pred, true)
    if p.std() == 0 or t.std() == 0:
        return 0.0
    return float(np.corrcoef(p, t)[0, 1])


corrcoef = pearson_r


def evaluate_metrics(pred, true) -> Dict[str, float]:
    """MSE/MAE/R2 (reference utils.py:75-80) + RMSE/CC/NSE."""
    return {
        "mse": mse(pred, true),
        "mae": mae(pred, true),
        "r2": r2_score(pred, true),
        "rmse": rmse(pred, true),
        "cc": pearson_r(pred, true),
        "nse": nse(pred, true),
    }
