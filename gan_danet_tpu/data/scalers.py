"""Standard-scaler compatible with the reference cache contract.

The reference caches sklearn StandardScaler objects via joblib
(GAN_DANet_train.ipynb cell 0). We keep a minimal, dependency-light
implementation with identical `mean_` / `scale_` attributes and
fit/transform semantics so that (a) joblib round-trips work, and (b)
real reference caches (pickled sklearn scalers) load interchangeably —
anything exposing mean_/scale_ is accepted by `as_scaler_stats`.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class StandardScaler:
    """Flat standardiser over all elements (the reference fits sklearn's
    StandardScaler on data reshaped to (-1, 1), datasets.py:409-424)."""

    def __init__(self):
        self.mean_ = None
        self.scale_ = None

    def fit(self, x: np.ndarray) -> "StandardScaler":
        flat = np.asarray(x, dtype=np.float64).reshape(-1)
        self.mean_ = np.array([flat.mean()])
        std = flat.std()
        self.scale_ = np.array([std if std > 0 else 1.0])
        return self

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x) - self.mean_[0]) / self.scale_[0]

    def inverse_transform(self, x):
        return x * self.scale_[0] + self.mean_[0]


@dataclass(frozen=True)
class ScalerStats:
    """Device-friendly (jit-closable) scaler view."""

    mean: float
    scale: float

    def transform(self, x):
        return (x - self.mean) / self.scale

    def inverse_transform(self, x):
        return x * self.scale + self.mean


def as_scaler_stats(scaler) -> ScalerStats:
    """Accept our StandardScaler, sklearn's, or anything with
    mean_/scale_ arrays (the reference's cached scalers)."""
    return ScalerStats(float(np.asarray(scaler.mean_).ravel()[0]),
                       float(np.asarray(scaler.scale_).ravel()[0]))
