"""The JAX R-peak kernel is validated against an independent numpy oracle of
the published gradient-threshold detector (using scipy.find_peaks for the
prominence step, i.e. the exact primitive the third-party library calls)."""

import numpy as np
import scipy.signal

from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record
from ae_waveforms_tpu.signals.filters import butterworth, zscore
from ae_waveforms_tpu.signals.rpeaks import find_rpeaks, find_rpeaks_batch


def _smooth_oracle(x, size):
    w = np.ones(size) / size
    xp = np.concatenate((x[0] * np.ones(size), x, x[-1] * np.ones(size)))
    return np.convolve(w, xp, mode="same")[size:-size]


def oracle_findpeaks(signal, fs=500):
    grad = np.gradient(signal)
    absgrad = np.abs(grad)
    smoothgrad = _smooth_oracle(absgrad, int(np.rint(0.1 * fs)))
    avggrad = _smooth_oracle(smoothgrad, int(np.rint(0.75 * fs)))
    gradthreshold = 1.5 * avggrad
    mindelay = int(np.rint(0.3 * fs))

    qrs = smoothgrad > gradthreshold
    beg_qrs = np.where(np.logical_and(np.logical_not(qrs[0:-1]), qrs[1:]))[0]
    end_qrs = np.where(np.logical_and(qrs[0:-1], np.logical_not(qrs[1:])))[0]
    if beg_qrs.size == 0:
        return np.array([], int)
    end_qrs = end_qrs[end_qrs > beg_qrs[0]]
    num_qrs = min(beg_qrs.size, end_qrs.size)
    min_len = np.mean(end_qrs[:num_qrs] - beg_qrs[:num_qrs]) * 0.4
    peaks = [0]
    for i in range(num_qrs):
        beg, end = beg_qrs[i], end_qrs[i]
        if end - beg < min_len:
            continue
        data = signal[beg:end]
        locmax, props = scipy.signal.find_peaks(data, prominence=(None, None))
        if locmax.size > 0:
            peak = beg + locmax[np.argmax(props["prominences"])]
            if peak - peaks[-1] > mindelay:
                peaks.append(peak)
    peaks.pop(0)
    return np.asarray(peaks, int)


def _make_window(seed, hr=72.0, noise=0.02):
    rec = synthetic_ecg_record(duration_s=22.0, fs=500, hr_bpm=hr, noise_std=noise, seed=seed)
    rec = zscore(rec)
    rec = butterworth(rec, "high", 1.0, 500, 4, precision="float64")
    rec = butterworth(rec, "low", 30.0, 500, 4, precision="float64")
    w = rec[:10000]
    return np.asarray(zscore(w), np.float32)


def test_kernel_matches_oracle_many_seeds():
    mismatches = 0
    total = 0
    for seed in range(12):
        for hr in (55.0, 72.0, 105.0, 150.0):
            w = _make_window(seed, hr=hr)
            ref = oracle_findpeaks(w.astype(np.float64), 500)
            peaks, n = find_rpeaks(w, 500)
            got = np.asarray(peaks)[: int(n)]
            total += 1
            if not (len(got) == len(ref) and np.array_equal(got, ref)):
                mismatches += 1
    assert mismatches == 0, f"{mismatches}/{total} windows disagreed with the oracle"


def test_kernel_matches_oracle_noisy():
    for seed in range(6):
        w = _make_window(100 + seed, noise=0.12)
        ref = oracle_findpeaks(w.astype(np.float64), 500)
        peaks, n = find_rpeaks(w, 500)
        got = np.asarray(peaks)[: int(n)]
        np.testing.assert_array_equal(got, ref)


def test_batch_consistent_with_single():
    ws = np.stack([_make_window(s) for s in range(4)])
    pb, nb = find_rpeaks_batch(ws, 500)
    for i in range(4):
        p1, n1 = find_rpeaks(ws[i], 500)
        assert int(nb[i]) == int(n1)
        np.testing.assert_array_equal(np.asarray(pb[i]), np.asarray(p1))


def test_detected_rate_plausible():
    w = _make_window(3, hr=72.0)
    peaks, n = find_rpeaks(w, 500)
    # ~24 beats in 20 s at 72 bpm; first 0.3 s excluded by the min-delay quirk
    assert 20 <= int(n) <= 28


def test_long_window_no_peak_truncation():
    """30-s windows (sample_length is a public knob) must not silently
    truncate peaks: the buffer derives from T and the 0.3 s refractory."""
    rec = synthetic_ecg_record(duration_s=32.0, fs=500, hr_bpm=150.0, seed=7)
    rec = zscore(rec)
    rec = butterworth(rec, "high", 1.0, 500, 4, precision="float64")
    rec = butterworth(rec, "low", 30.0, 500, 4, precision="float64")
    w = np.asarray(zscore(rec[:15000]), np.float32)
    ref = oracle_findpeaks(w.astype(np.float64), 500)
    peaks, n = find_rpeaks(w, 500)
    got = np.asarray(peaks)[: int(n)]
    assert int(n) == len(got), "n_peaks must count stored peaks"
    np.testing.assert_array_equal(got, ref)
    assert len(ref) > 60  # 150 bpm x 30 s actually stresses the old 72 cap


def test_unfiltered_broadband_noise_matches_oracle():
    """No low-pass at all (cfg.butter_lp_ecg=0 is public): broadband noise
    maximizes strict local maxima; the provable candidate bound must keep
    the detector exact rather than silently dropping candidates."""
    rng = np.random.default_rng(5)
    w = np.asarray(rng.standard_normal(10000), np.float32)
    ref = oracle_findpeaks(w.astype(np.float64), 500)
    peaks, n = find_rpeaks(w, 500)
    got = np.asarray(peaks)[: int(n)]
    np.testing.assert_array_equal(got, ref)
