"""Figure layer: the reference's plot scripts as library functions.

Covers the roles of (ref: */src/evaluate_plot_results/Plot_*.m,
main/createfigure.m:1-65, main/show_beamforming_data.m:20-49,
Numerical_Simulation/src/others/plot_*.m):
  - recovery error vs measurements / SNR curves
  - CDF of channel NMSE
  - beam patterns and beam width
  - spectral-profile (power-law) diagnostics
  - beamforming-RSS method comparison

matplotlib is imported lazily so headless/compute-only deployments never
pay for it.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_error_vs_grid(grid, curves: Dict[str, np.ndarray],
                       xlabel: str, path: str, logy: bool = True,
                       ylabel: str = "NMSE"):
    """Error curves per method (ref: Plot_result.m / Plot_result_H.m)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, ys in sorted(curves.items()):
        ax.plot(grid, ys, marker="o", label=name)
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_nmse_cdf(nmse_by_method: Dict[str, np.ndarray], path: str):
    """CDF of per-instance channel NMSE (ref: CDF_H.m)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, vals in sorted(nmse_by_method.items()):
        v = np.sort(10 * np.log10(np.maximum(np.asarray(vals), 1e-30)))
        ax.plot(v, np.linspace(0, 1, len(v)), label=name)
    ax.set_xlabel("NMSE (dB)")
    ax.set_ylabel("CDF")
    ax.grid(True, alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_beam_pattern(weights, k_d: float, path: str,
                      n_angles: int = 721):
    """|a(theta)^H w| over azimuth for each beam (ref: show_beam_pattern.m)."""
    plt = _plt()
    w = np.atleast_2d(np.asarray(weights))
    if w.shape[0] > w.shape[1]:
        w = w.T                                  # beams on rows
    n = w.shape[1]
    theta = np.linspace(-90, 90, n_angles)
    a = np.exp(-1j * k_d * np.sin(np.deg2rad(theta))[:, None]
               * np.arange(n)[None, :]) / np.sqrt(n)
    gain = np.abs(a.conj() @ w.T)
    fig, ax = plt.subplots(figsize=(6, 4))
    for i in range(min(w.shape[0], 16)):
        ax.plot(theta, 20 * np.log10(np.maximum(gain[:, i], 1e-6)), lw=0.8)
    ax.set_xlabel("azimuth (deg)")
    ax.set_ylabel("gain (dB)")
    ax.set_ylim(-40, 5)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_spectral_profile(h_matrices, path: str,
                          ladders: Optional[Dict[str, Sequence]] = None):
    """Captured-energy curves vs the constraint ladders
    (ref: plot_deviation_from_power_law.m:10-30)."""
    from .spectral_analysis import captured_energy

    plt = _plt()
    frac = np.asarray(captured_energy(h_matrices))
    fig, ax = plt.subplots(figsize=(6, 4))
    ks = np.arange(1, frac.shape[-1] + 1)
    for row in frac.reshape(-1, frac.shape[-1])[:32]:
        ax.plot(ks, row, color="C0", alpha=0.3, lw=0.8)
    if ladders:
        for name, lad in ladders.items():
            rs = [r for r, _ in lad]
            fs = [f for _, f in lad]
            ax.step(rs, fs, where="post", marker="s", label=name)
        ax.legend(fontsize=8)
    ax.set_xlabel("rank prefix k")
    ax.set_ylabel("captured energy fraction")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_beamforming_rss(rss_by_method: Dict[str, float], path: str):
    """Per-method beamformed-RSS bars (ref: createfigure.m:1-65,
    show_beamforming_data.m:20-49)."""
    plt = _plt()
    names = sorted(rss_by_method)
    vals = [rss_by_method[k] for k in names]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(range(len(names)), vals)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=30, ha="right", fontsize=8)
    ax.set_ylabel("beamformed RSS (dBm)")
    ax.grid(True, axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path
