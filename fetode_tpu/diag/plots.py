"""Training/eval plot artifacts (loss curves, trajectories, forecasts).

Parity with the reference's matplotlib observability layer
(``plotter``/``plotter_opt`` — ``train_kanfet_node_predprey.py:54-141``;
``forecast_trend_plot`` — ``train_kan_fet_ett.py:200-245``; comparison
charts — ``train_ecg.py:1418-1463``).  All optional; headless Agg backend.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_trajectory(ts, truth, pred, out_path: str, *, train_cut: float = None,
                    labels=("x", "y"), ylim=(0, 8)):
    """Truth vs predicted state trajectories (the predprey epoch plot)."""
    plt = _plt()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots()
    colors = ["g", "b", "r", "m"]
    for d in range(truth.shape[1]):
        c = colors[d % len(colors)]
        ax.plot(ts, truth[:, d], color=c, label=f"{labels[d % len(labels)]}_data")
        ax.plot(ts, pred[:, d], color=c, linestyle="dashed",
                label=f"{labels[d % len(labels)]}_pred")
    if train_cut is not None:
        ax.vlines(train_cut, *ylim)
    ax.set_ylim(ylim)
    ax.set_xlabel("time")
    ax.set_ylabel("state")
    ax.legend()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_losses(history: Dict[str, Sequence[float]], out_path: str,
                *, logy: bool = True):
    """Semilogy loss curves from a history dict of lists."""
    plt = _plt()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots()
    for name, values in history.items():
        if isinstance(values, (list, tuple, np.ndarray)) and len(values) and \
                np.isscalar(np.asarray(values).flat[0]):
            (ax.semilogy if logy else ax.plot)(np.asarray(values, float),
                                               label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_forecast(history_y, forecast, out_path: str, *, context_tail: int = 200):
    """Series tail + forecast overlay (forecast_trend_plot capability)."""
    plt = _plt()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    hist = np.asarray(history_y, float)[-context_tail:]
    fc = np.asarray(forecast, float)
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(np.arange(len(hist)), hist, label="history")
    ax.plot(np.arange(len(hist), len(hist) + len(fc)), fc, label="forecast",
            color="r")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_model_comparison(results: Dict[str, Sequence[float]], out_path: str,
                          ylabel: str = "test accuracy"):
    """Side-by-side curves for several models (the ECG comparison chart)."""
    plt = _plt()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots()
    for name, curve in results.items():
        ax.plot(np.asarray(curve, float), label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel(ylabel)
    ax.legend()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
