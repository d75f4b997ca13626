import numpy as np
import pytest
import scipy.signal

from ae_waveforms_tpu.signals.filters import butter_coefficients, butterworth, zscore


def _noisy_signal(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 500.0
    return np.sin(2 * np.pi * 1.7 * t) + 0.3 * rng.standard_normal(n)


def test_zscore_matches_numpy():
    x = _noisy_signal()
    ref = (x - np.nanmean(x)) / np.nanstd(x)
    np.testing.assert_allclose(zscore(x), ref, rtol=1e-12)


def test_zscore_nan_aware():
    x = _noisy_signal()
    x[100:200] = np.nan
    out = zscore(x)
    assert np.isnan(out[150])
    valid = ~np.isnan(x)
    np.testing.assert_allclose(np.nanmean(out), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.nanstd(out[valid]), 1.0, atol=1e-12)


@pytest.mark.parametrize("btype,cutoff", [("high", 1.0), ("low", 30.0)])
def test_filtfilt_float64_matches_scipy(btype, cutoff):
    x = _noisy_signal()
    b, a, _ = butter_coefficients(4, cutoff, btype, 500.0)
    ref = scipy.signal.filtfilt(b, a, x)
    out = butterworth(x, btype, cutoff, 500, 4, precision="float64")
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("btype,cutoff", [("high", 1.0), ("low", 30.0)])
def test_filtfilt_parallel_scan_matches_scipy(btype, cutoff):
    """The associative-scan TPU kernel tracks scipy within float32 headroom."""
    x = _noisy_signal()
    b, a, _ = butter_coefficients(4, cutoff, btype, 500.0)
    ref = scipy.signal.filtfilt(b, a, x)
    out = butterworth(x, btype, cutoff, 500, 4, precision="float32")
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_filtfilt_nan_segments():
    """NaN gaps split the record; each segment filtered separately; short
    segments (<= 15 samples) pass through (reference filters.py:50-51)."""
    x = _noisy_signal(2000)
    x[500:600] = np.nan
    x[1500:1503] = np.nan  # leaves a trailing segment of 497 > 15
    x[1510:1990] = np.nan  # leaves a 7-sample segment [1503,1510) -> passthrough
    out = butterworth(x, "low", 30.0, 500, 4, precision="float64")

    b, a, _ = butter_coefficients(4, 30.0, "low", 500.0)
    np.testing.assert_allclose(out[:500], scipy.signal.filtfilt(b, a, x[:500]), atol=1e-10)
    np.testing.assert_allclose(out[600:1500], scipy.signal.filtfilt(b, a, x[600:1500]), atol=1e-10)
    np.testing.assert_array_equal(out[1503:1510], x[1503:1510])  # passthrough
    assert np.all(np.isnan(out[500:600]))
    assert np.all(np.isnan(out[1510:1990]))


def test_filtfilt_first_last_nan():
    x = _noisy_signal(1000)
    x[:5] = np.nan
    x[-7:] = np.nan
    out = butterworth(x, "high", 1.0, 500, 4, precision="float64")
    b, a, _ = butter_coefficients(4, 1.0, "high", 500.0)
    np.testing.assert_allclose(out[5:-7], scipy.signal.filtfilt(b, a, x[5:-7]), atol=1e-10)
    assert np.all(np.isnan(out[:5])) and np.all(np.isnan(out[-7:]))
