"""Batched device computation of the 35-column feature rows — the vmapped
twin of ``signals.features`` fed by ``signals.delineate_jax``.

Per window: relative-(x, y) of the ten fiducials against each beat's R peak,
the 15 morphology intervals/prominences, and nanmedians over beats, emitted
in the np_features column order.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ae_waveforms_tpu.core.schema import FIDUCIAL_NAMES

__all__ = ["feature_rows_batch"]


def _nanmedian(v: jnp.ndarray) -> jnp.ndarray:
    """np.nanmedian over a 1-D array (NaN if all-NaN)."""
    notnan = ~jnp.isnan(v)
    n = jnp.sum(notnan)
    s = jnp.sort(jnp.where(notnan, v, jnp.inf))
    K = v.shape[0]
    lo = s[jnp.clip((n - 1) // 2, 0, K - 1)]
    hi = s[jnp.clip(n // 2, 0, K - 1)]
    return jnp.where(n > 0, (lo + hi) / 2.0, jnp.nan)


def _one_window(sample, peaks, n_peaks, fid_stack, fs):
    """sample (T,), peaks (K,), fid_stack (10, K) -> (35,) feature row."""
    K = peaks.shape[0]
    T = sample.shape[0]
    beat_valid = (jnp.arange(K) < n_peaks) & (peaks >= 0)
    r_idx = jnp.clip(peaks, 0, T - 1)
    r_amp = sample[r_idx]

    def rel(idx):
        ii = jnp.clip(jnp.nan_to_num(idx).astype(jnp.int32), 0, T - 1)
        x = (idx - r_idx.astype(jnp.float32)) / fs * 1000.0
        y = sample[ii] - r_amp
        bad = jnp.isnan(idx) | ~beat_valid
        return jnp.where(bad, jnp.nan, x), jnp.where(bad, jnp.nan, y)

    xs, ys = jax.vmap(rel)(fid_stack)  # (10, K) each
    f = {name: i for i, name in enumerate(FIDUCIAL_NAMES)}
    rx = jnp.where(beat_valid, 0.0, jnp.nan)  # injected R at (0, 0)
    ry = rx

    def X(name):
        return rx if name == "R" else xs[f[f"ECG_{name}"]]

    def Y(name):
        return ry if name == "R" else ys[f[f"ECG_{name}"]]

    def nmax(a, b):
        """np.nanmax of two arrays elementwise (NaN only if both NaN)."""
        both = jnp.isnan(a) & jnp.isnan(b)
        m = jnp.maximum(jnp.nan_to_num(a, nan=-jnp.inf), jnp.nan_to_num(b, nan=-jnp.inf))
        return jnp.where(both, jnp.nan, m)

    morph = [
        X("P_Offsets") - X("P_Onsets"),  # P duration
        rx - X("R_Onsets"),  # Q duration
        X("S_Peaks") - X("Q_Peaks"),  # R duration
        X("R_Offsets") - rx,  # S duration
        X("T_Offsets") - X("T_Onsets"),  # T duration
        rx - X("P_Onsets"),  # PR interval
        X("R_Offsets") - X("R_Onsets"),  # QRS complex
        X("T_Offsets") - X("R_Offsets"),  # ST interval
        X("T_Onsets") - X("R_Offsets"),  # ST segment
        X("T_Offsets") - X("R_Onsets"),  # QT interval
        Y("P_Peaks") - nmax(Y("P_Onsets"), Y("P_Offsets")),  # P prominence
        Y("Q_Peaks") - Y("R_Onsets"),  # Q prominence
        ry - nmax(Y("Q_Peaks"), Y("S_Peaks")),  # R prominence
        Y("S_Peaks") - Y("R_Offsets"),  # S prominence
        Y("T_Peaks") - nmax(Y("T_Onsets"), Y("T_Offsets")),  # T prominence
    ]

    cols = []
    for i in range(10):
        cols.append(_nanmedian(xs[i]))
        cols.append(_nanmedian(ys[i]))
    for m in morph:
        cols.append(_nanmedian(m))
    return jnp.stack(cols)


@functools.partial(jax.jit, static_argnames=("fs",))
def feature_rows_batch(
    samples: jnp.ndarray,
    peaks: jnp.ndarray,
    n_peaks: jnp.ndarray,
    fiducials: Dict[str, jnp.ndarray],
    fs: int = 500,
) -> jnp.ndarray:
    """(B, T) windows -> (B, 35) feature rows."""
    fid_stack = jnp.stack([fiducials[name] for name in FIDUCIAL_NAMES], axis=1)  # (B, 10, K)
    return jax.vmap(lambda s, p, n, fst: _one_window(s, p, n, fst, float(fs)))(
        samples.astype(jnp.float32), peaks, n_peaks, fid_stack
    )
