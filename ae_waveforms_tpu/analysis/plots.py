"""Host-side plotting helpers (reference: custom_plots.py:6-37 and the
figure hooks in median_sample.py:85-122 / features_ecg.py:5-53).

Matplotlib is imported lazily with the Agg backend so headless/TPU runs
never touch a display.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["plot_rmse_distribution", "plot_median_beat"]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_rmse_distribution(avg_rmse: float, rmse_values: np.ndarray, results_dir: str) -> str:
    """Violin plot of per-sample RMSE with the mean marked; saved at dpi 400
    as RMSE_distribution.png (custom_plots.py:34-35 contract)."""
    plt = _plt()
    try:
        import seaborn as sns

        plt.figure(figsize=(8, 3))
        sns.violinplot(data=rmse_values, orient="h", color="skyblue", inner="quart", linewidth=1.5)
    except ImportError:
        plt.figure(figsize=(8, 3))
        plt.violinplot(rmse_values, vert=False)
    plt.axvline(avg_rmse, color="red", linestyle="--", label=f"Avg RMSE = {avg_rmse:.4f}")
    plt.xlabel("RMSE")
    plt.ylabel("Sample Density")
    plt.title("Distribution of RMSE Values")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.6)
    plt.tight_layout()
    out = os.path.join(results_dir, "RMSE_distribution.png")
    plt.savefig(out, dpi=400, transparent=True)
    plt.close()
    return out


def plot_median_beat(beat: np.ndarray, out_path: str, fs: int = 500) -> str:
    plt = _plt()
    t = (np.arange(len(beat)) - len(beat) // 3) / fs * 1000
    plt.figure(figsize=(10, 4))
    plt.plot(t, beat, color="black")
    plt.xlabel("Time (ms)")
    plt.ylabel("Amplitude")
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(out_path, dpi=200)
    plt.close()
    return out_path
