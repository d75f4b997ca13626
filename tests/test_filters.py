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


def test_butterworth_batched_matches_per_record_chain():
    """butterworth_batched must equal the sequential HP-then-LP butterworth
    per record bitwise (same kernel composition), across NaN gaps, short
    pass-through segments, and mixed record lengths."""
    from ae_waveforms_tpu.signals.filters import butterworth, butterworth_batched

    rng = np.random.default_rng(0)
    records = []
    # plain record
    records.append(rng.standard_normal(5000).astype(np.float32))
    # NaN gap in the middle + NaN edges
    r = rng.standard_normal(7000).astype(np.float32)
    r[:37] = np.nan
    r[3000:3400] = np.nan
    r[-11:] = np.nan
    records.append(r)
    # a segment short enough for the pass-through rule (<= 3*(order+1) = 15)
    r = rng.standard_normal(2100).astype(np.float32)
    r[10:2000] = np.nan  # leaves a 10-sample head segment
    records.append(r)
    # empty and all-NaN records: handled without reaching the filter
    # (the per-record sequential path never sees these — preprocess_record
    # guards them — so they are asserted directly)
    records.append(np.full(0, np.nan, np.float32))
    records.append(np.full(300, np.nan, np.float32))

    got = butterworth_batched(records, 1.0, 30.0, 500, 4)
    for rec, g in zip(records[:-2], got[:-2]):
        want = butterworth(rec, "high", 1.0, 500, 4, "float32")
        want = butterworth(want, "low", 30.0, 500, 4, "float32")
        np.testing.assert_array_equal(np.asarray(g), np.asarray(want, np.float32))
    assert len(got[-2]) == 0
    assert np.isnan(got[-1]).all()


def test_preprocess_records_batched_matches_per_record():
    from ae_waveforms_tpu.core.config import ExtractionConfig
    from ae_waveforms_tpu.data.extract import preprocess_record, preprocess_records_batched

    rng = np.random.default_rng(1)
    cfg = ExtractionConfig()
    records = []
    for n in (4096, 9000, 6000):
        r = rng.standard_normal(n).astype(np.float64)
        if n == 9000:
            r[:100] = np.nan
            r[4000:4200] = np.nan
        records.append(r)
    got = preprocess_records_batched(records, cfg)
    for rec, g in zip(records, got):
        want = preprocess_record(rec, cfg)
        np.testing.assert_allclose(np.asarray(g), np.asarray(want, np.float32), equal_nan=True, atol=0)
