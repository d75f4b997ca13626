"""Median-beat extraction (reference: median_sample.py:6-54).

Per R peak, a 320-sample section is sliced with 1/3 (106 samples) before and
2/3 (214) after the peak; sections clipped by the window edges are padded
with NaN *at the end* (so beats whose pre-window is clipped start at sample 0
and are left-shifted — a reference quirk preserved for parity).  The median
beat is the per-position nanmedian over all sections.

TPU-native: one gather + masked sort per window, vmapped over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["median_beat", "median_beat_batch", "aligned_sections", "BEAT_LENGTH", "PRE_R", "POST_R"]

BEAT_LENGTH = 320  # int(0.8 * (60/75) * 500)
PRE_R = BEAT_LENGTH // 3  # 106
POST_R = BEAT_LENGTH - PRE_R  # 214


def aligned_sections(sample: jnp.ndarray, peaks: jnp.ndarray, n_peaks: jnp.ndarray) -> jnp.ndarray:
    """(max_peaks, 320) sections; rows beyond n_peaks and clipped tails are NaN."""
    T = sample.shape[0]
    start = jnp.maximum(0, peaks - PRE_R)  # (max_peaks,)
    end = jnp.minimum(T, peaks + POST_R)
    offs = jnp.arange(BEAT_LENGTH)
    idx = start[:, None] + offs[None, :]
    vals = sample[jnp.clip(idx, 0, T - 1)]
    valid = (idx < end[:, None]) & (jnp.arange(peaks.shape[0])[:, None] < n_peaks)
    return jnp.where(valid, vals, jnp.nan)


def _nanmedian_axis0(a: jnp.ndarray) -> jnp.ndarray:
    """np.nanmedian over axis 0 for a (K, L) array."""
    notnan = ~jnp.isnan(a)
    n = jnp.sum(notnan, axis=0)
    s = jnp.sort(jnp.where(notnan, a, jnp.inf), axis=0)
    K = a.shape[0]
    lo_i = jnp.clip((n - 1) // 2, 0, K - 1)
    hi_i = jnp.clip(n // 2, 0, K - 1)
    cols = jnp.arange(a.shape[1])
    med = (s[lo_i, cols] + s[hi_i, cols]) / 2.0
    return jnp.where(n > 0, med, jnp.nan)


def median_beat(sample: jnp.ndarray, peaks: jnp.ndarray, n_peaks: jnp.ndarray) -> jnp.ndarray:
    """Median beat (320,) for one window."""
    return _nanmedian_axis0(aligned_sections(sample, peaks, n_peaks))


@jax.jit
def median_beat_batch(samples: jnp.ndarray, peaks: jnp.ndarray, n_peaks: jnp.ndarray) -> jnp.ndarray:
    """(B, 320) median beats for a (B, T) batch."""
    return jax.vmap(median_beat)(samples, peaks, n_peaks)
