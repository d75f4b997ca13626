"""Sample quality-control filters (reference: remove_samples.py:8-121).

Operates on fixed-shape padded peak arrays (peaks: (max_peaks,) int32, -1
padding) so the whole QC pass vmaps over the batch of windows.

Parity notes
------------
- HR is 60*fs / median(diff(peaks)) ("max" mode of ``estimate_hr``,
  remove_samples.py:85-107); NaN when fewer than 2 peaks.
- RMSSD deliberately reproduces the reference's unit bug
  (remove_samples.py:119): intervals are divided by ``fs * 1000`` instead of
  multiplied by ``1000 / fs``, making RMSSD ~10^6x too small so the
  ``pvc_threshold=150`` filter never fires.  Replicated so that exactly the
  same samples survive.
- The SD ratio is std(sample) / n_peaks (remove_samples.py:62-64) with
  threshold 0.05 (the function default; the README's 0.0335 is stale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["estimate_hr", "rmssd", "qc_mask"]


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """np.median over the masked subset (NaN if empty)."""
    n = jnp.sum(mask)
    big = jnp.where(mask, values, jnp.inf)
    s = jnp.sort(big)
    lo = s[jnp.clip((n - 1) // 2, 0, values.shape[0] - 1)]
    hi = s[jnp.clip(n // 2, 0, values.shape[0] - 1)]
    return jnp.where(n > 0, (lo + hi) / 2.0, jnp.nan)


def estimate_hr(peaks: jnp.ndarray, n_peaks: jnp.ndarray, sampling_frequency: float) -> jnp.ndarray:
    """HR (bpm) from the median inter-peak interval ('max' mode)."""
    d = (peaks[1:] - peaks[:-1]).astype(jnp.float32)
    mask = jnp.arange(d.shape[0]) < (n_peaks - 1)
    med = _masked_median(d, mask)
    return 60.0 * sampling_frequency / med


def rmssd(peaks: jnp.ndarray, n_peaks: jnp.ndarray, sampling_frequency: float = 500) -> jnp.ndarray:
    """RMSSD of HRV — including the reference's unit bug (see module docs)."""
    d = (peaks[1:] - peaks[:-1]).astype(jnp.float32)
    # parity: reference divides by (fs * 1000), remove_samples.py:119
    intervals = d / (sampling_frequency * 1000.0)
    sd = intervals[1:] - intervals[:-1]
    mask = jnp.arange(sd.shape[0]) < (n_peaks - 2)
    n = jnp.maximum(jnp.sum(mask), 1)
    ms = jnp.sum(jnp.where(mask, sd**2, 0.0)) / n
    return jnp.where(jnp.sum(mask) > 0, jnp.sqrt(ms), jnp.nan)


@functools.partial(jax.jit, static_argnames=("sampling_frequency",))
def qc_mask(
    samples: jnp.ndarray,
    peaks: jnp.ndarray,
    n_peaks: jnp.ndarray,
    sampling_frequency: float = 500,
    pvc_threshold: float = 150.0,
    sd_threshold_ecg: float = 0.05,
) -> jnp.ndarray:
    """Boolean keep-mask over a batch of windows.

    samples: (B, T); peaks: (B, max_peaks) padded with -1; n_peaks: (B,).
    Drops samples with any NaN, HR < 30 or > 180 or NaN, RMSSD > pvc
    threshold, or std/n_peaks > sd threshold (remove_samples.py:29-74).
    """
    has_nan = jnp.any(jnp.isnan(samples), axis=1)
    hr = jax.vmap(lambda p, n: estimate_hr(p, n, sampling_frequency))(peaks, n_peaks)
    hrv = jax.vmap(lambda p, n: rmssd(p, n, sampling_frequency))(peaks, n_peaks)
    sd = jnp.std(samples, axis=1)
    ratio = sd / jnp.maximum(n_peaks, 1)
    ratio = jnp.where(n_peaks == 0, jnp.inf, ratio)

    bad = (
        has_nan
        | (hr < 30.0)
        | (hr > 180.0)
        | jnp.isnan(hr)
        | (hrv > pvc_threshold)
        | (ratio > sd_threshold_ecg)
    )
    return ~bad
