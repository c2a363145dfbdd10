"""Plotting utilities (capability parity: reference utils.py `plot_results`,
test.ipynb spatial/time-series figures, deep_ensemble uncertainty maps)."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_results(
    lr: np.ndarray,
    downscaled: np.ndarray,
    hr: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
    save_path: Optional[str] = None,
):
    """2- or 3-panel imshow comparison with a shared colour scale
    (reference utils.py:4-73)."""
    plt = _plt()
    panels = [("LR input", lr), ("Downscaled", downscaled)]
    if hr is not None:
        panels.append(("HR original", hr))

    arrays = []
    for _, arr in panels:
        a = np.asarray(arr, dtype=np.float64)
        if mask is not None and mask.shape == a.shape:
            a = np.where(mask > 0, a, np.nan)
        arrays.append(a)

    vmin = min(np.nanmin(a) for a in arrays)
    vmax = max(np.nanmax(a) for a in arrays)
    fig, axes = plt.subplots(1, len(panels), figsize=(5 * len(panels), 4))
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, _), a in zip(axes, panels, arrays):
        im = ax.imshow(a, vmin=vmin, vmax=vmax, cmap="jet_r", origin="lower")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=200, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_timeseries_with_uncertainty(
    series: np.ndarray,
    uncertainty: Optional[np.ndarray] = None,
    others: Optional[dict] = None,
    labels=("Downscaled TWSA",),
    ylabel: str = "TWSA (cm)",
    save_path: Optional[str] = None,
):
    """Uncertainty-band time-series figure (test.ipynb cell 3)."""
    plt = _plt()
    import pandas as pd

    n = len(series)
    dates = pd.date_range(start="2002-08", periods=n, freq="ME")
    fig, ax = plt.subplots(figsize=(12, 6))
    if uncertainty is not None:
        ax.fill_between(dates, series - uncertainty, series + uncertainty,
                        color="#a6bddb", alpha=0.3, label="Uncertainty")
    ax.plot(dates, series, color="#1f77b4", label=labels[0])
    for name, s in (others or {}).items():
        ax.plot(dates, s, label=name)
    ax.set_xlabel("Date")
    ax.set_ylabel(ylabel)
    ax.legend()
    ax.grid(True, linestyle="--", linewidth=0.5)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=300, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_spatial_comparison(
    predicted: np.ndarray,
    target: np.ndarray,
    sample_idx: int = 0,
    vlim: float = 30.0,
    save_path: Optional[str] = None,
):
    """2-panel predicted-vs-true map (test.ipynb `_plot_spatial_distribution`)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    for ax, (title, arr) in zip(
        axes,
        [("Predicted GRACE Spatial Distribution", predicted),
         ("True GRACE Spatial Distribution", target)],
    ):
        im = ax.imshow(np.asarray(arr)[sample_idx], cmap="jet_r",
                       vmin=-vlim, vmax=vlim, origin="lower")
        ax.set_title(title)
        ax.set_xlabel("Longitude index")
        ax.set_ylabel("Latitude index")
        fig.colorbar(im, ax=ax, label="GRACE Value")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, format=save_path.split(".")[-1],
                    bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_uncertainty_map(
    uncertainty: np.ndarray,
    sample_idx: int = 0,
    save_path: Optional[str] = None,
):
    """Per-pixel ensemble-std map (deep_ensemble.ipynb cell 1)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    im = ax.imshow(np.asarray(uncertainty)[sample_idx], cmap="viridis",
                   origin="lower")
    ax.set_title("Ensemble uncertainty (std across members)")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=200, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_losses(losses_g: Sequence[float], losses_d: Sequence[float],
                save_path: Optional[str] = None):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(losses_g, label="Generator")
    ax.plot(losses_d, label="Discriminator")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    ax.legend()
    ax.grid(True, linestyle="--", linewidth=0.5)
    if save_path:
        fig.savefig(save_path, dpi=200, bbox_inches="tight")
        plt.close(fig)
    return fig
