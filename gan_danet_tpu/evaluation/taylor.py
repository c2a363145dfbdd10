"""Taylor diagram — polar summary of (correlation, normalised std, centred
RMS) for model-vs-reference comparison.

Capability parity with the reference's taylorDiagram.py (Copin's
public-domain implementation), written fresh: `taylor_stats` computes the
triplet; `TaylorDiagram` renders a quarter/half-polar matplotlib axes where
the azimuth is arccos(correlation), the radius is the standard deviation,
and centred-RMS iso-contours circle the reference point.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def taylor_stats(pred, ref) -> Dict[str, float]:
    p = np.asarray(pred, dtype=np.float64).ravel()
    r = np.asarray(ref, dtype=np.float64).ravel()
    ok = np.isfinite(p) & np.isfinite(r)
    p, r = p[ok], r[ok]
    std_p = p.std()
    std_r = r.std()
    corr = float(np.corrcoef(p, r)[0, 1]) if std_p > 0 and std_r > 0 else 0.0
    crmse = float(np.sqrt(np.mean(((p - p.mean()) - (r - r.mean())) ** 2)))
    return {"std": float(std_p), "ref_std": float(std_r),
            "corr": corr, "crmse": crmse}


class TaylorDiagram:
    """Matplotlib Taylor diagram.

    Usage:
        td = TaylorDiagram(ref_std, fig=fig, label='GRACE')
        td.add_sample(model_std, corr, marker='o', label='GAN-DANet')
        td.add_rms_contours()
        td.ax.legend(...)
    """

    def __init__(
        self,
        ref_std: float,
        fig=None,
        rect: int = 111,
        label: str = "Reference",
        std_range: Tuple[float, float] = (0.0, 1.6),
        extend_negative: bool = False,
    ):
        import matplotlib.pyplot as plt
        from matplotlib.projections import PolarAxes

        self.ref_std = float(ref_std)
        self.theta_max = np.pi if extend_negative else np.pi / 2

        if fig is None:
            fig = plt.figure()
        ax = fig.add_subplot(rect, projection="polar")
        ax.set_thetamin(0)
        ax.set_thetamax(np.degrees(self.theta_max))
        ax.set_rlim(std_range[0] * self.ref_std, std_range[1] * self.ref_std)

        # correlation tick marks along the arc
        corr_ticks = np.array([0.0, 0.2, 0.4, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99, 1.0])
        if extend_negative:
            corr_ticks = np.concatenate([-corr_ticks[::-1][:-1], corr_ticks])
        ax.set_xticks(np.arccos(np.clip(corr_ticks, -1, 1)))
        ax.set_xticklabels([f"{c:g}" for c in corr_ticks])
        ax.set_xlabel("Correlation")
        self.ax = ax
        self.fig = fig
        self.sample_points = []

        # reference point + its std arc
        (pt,) = ax.plot([0.0], [self.ref_std], "k*", ms=12, label=label)
        theta = np.linspace(0, self.theta_max, 100)
        ax.plot(theta, np.full_like(theta, self.ref_std), "k--", lw=0.8)
        self.sample_points.append(pt)

    def add_sample(self, std: float, corr: float, **plot_kw):
        theta = np.arccos(np.clip(corr, -1.0, 1.0))
        (pt,) = self.ax.plot([theta], [std], **plot_kw)
        self.sample_points.append(pt)
        return pt

    def add_rms_contours(self, levels: int = 5, **contour_kw):
        rs, ts = np.meshgrid(
            np.linspace(*self.ax.get_ylim(), 100),
            np.linspace(0, self.theta_max, 100),
        )
        rms = np.sqrt(self.ref_std**2 + rs**2 - 2 * self.ref_std * rs * np.cos(ts))
        kw = {"colors": "0.6", "linewidths": 0.8}
        kw.update(contour_kw)
        contours = self.ax.contour(ts, rs, rms, levels, **kw)
        self.ax.clabel(contours, inline=True, fontsize=8, fmt="%.2f")
        return contours


def plot_taylor(
    samples: Dict[str, np.ndarray],
    reference: np.ndarray,
    save_path: Optional[str] = None,
    normalised: bool = True,
):
    """One-call diagram for {name: prediction} against a reference field."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    ref = np.asarray(reference)
    ref_std = np.nanstd(ref)
    scale = 1.0 / ref_std if normalised else 1.0
    td = TaylorDiagram(ref_std * scale, label="Reference")
    markers = "osd^vP*X"
    for i, (name, pred) in enumerate(samples.items()):
        st = taylor_stats(pred, ref)
        td.add_sample(st["std"] * scale, st["corr"],
                      marker=markers[i % len(markers)], ls="", label=name)
    td.add_rms_contours()
    td.ax.legend(loc="upper right", bbox_to_anchor=(1.25, 1.05), fontsize=8)
    if save_path:
        td.fig.savefig(save_path, dpi=200, bbox_inches="tight")
        plt.close(td.fig)
    return td
