import numpy as np

from ae_waveforms_tpu.signals.median_beat import BEAT_LENGTH, POST_R, PRE_R, median_beat, median_beat_batch
from ae_waveforms_tpu.signals.qc import estimate_hr, qc_mask, rmssd
from ae_waveforms_tpu.signals.segment import segment_record


def _pad(peaks, max_peaks=128):
    out = np.full(max_peaks, -1, np.int32)
    out[: len(peaks)] = peaks
    return out


def oracle_median_beat(sample, peaks):
    """Direct numpy transcription of the documented slicing semantics."""
    sections = []
    for r in peaks:
        start = max(0, r - PRE_R)
        end = min(len(sample), r + POST_R)
        sec = sample[start:end]
        if len(sec) < BEAT_LENGTH:
            padded = np.full(BEAT_LENGTH, np.nan)
            padded[: len(sec)] = sec
            sec = padded
        sections.append(sec)
    return np.nanmedian(np.array(sections), axis=0)


def test_estimate_hr_median_interval():
    peaks = np.array([100, 500, 910, 1315, 1700])
    hr = float(estimate_hr(_pad(peaks), np.int32(len(peaks)), 500.0))
    ref = 60 * 500 / np.median(np.diff(peaks))
    np.testing.assert_allclose(hr, ref, rtol=1e-6)


def test_estimate_hr_nan_when_single_peak():
    assert np.isnan(float(estimate_hr(_pad([100]), np.int32(1), 500.0)))


def test_rmssd_preserves_unit_bug():
    peaks = np.array([100, 520, 905, 1350, 1725])
    got = float(rmssd(_pad(peaks), np.int32(len(peaks)), 500))
    intervals = np.diff(peaks) / (500 * 1000)  # parity: the reference's bug
    ref = np.sqrt(np.mean(np.diff(intervals) ** 2))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    assert got < 1e-3  # the bug makes RMSSD tiny, so the PVC filter never fires


def test_qc_mask_rules():
    rng = np.random.default_rng(0)
    T = 10000
    base = rng.standard_normal((5, T)).astype(np.float32) * 0.01
    # window 0: normal HR (75 bpm -> interval 400)
    pk0 = np.arange(400, 9600, 400)
    # window 1: bradycardia < 30 bpm (interval 2004 -> ~29.9 bpm)
    pk1 = np.arange(500, 9500, 2004)
    # window 2: tachycardia > 180 (interval 160 -> 187 bpm)
    pk2 = np.arange(300, 9700, 160)
    # window 3: no peaks -> NaN HR
    pk3 = []
    # window 4: NaN in signal
    pk4 = np.arange(400, 9600, 400)
    base[4, 50] = np.nan

    peaks = np.stack([_pad(p) for p in (pk0, pk1, pk2, pk3, pk4)])
    n_peaks = np.array([len(pk0), len(pk1), len(pk2), 0, len(pk4)], np.int32)
    keep = np.asarray(qc_mask(base, peaks, n_peaks, 500))
    # sd/n_peaks for window 0: std~0.01/23 << 0.05 -> keep
    assert keep.tolist() == [True, False, False, False, False]


def test_qc_sd_ratio():
    T = 10000
    x = np.zeros((1, T), np.float32)
    x[0] = np.sin(np.arange(T)) * 3.0  # std ~2.1
    pk = np.arange(400, 9600, 400)  # 23 peaks -> ratio ~0.09 > 0.05
    keep = np.asarray(qc_mask(x, _pad(pk)[None], np.array([len(pk)], np.int32), 500))
    assert keep.tolist() == [False]


def test_median_beat_matches_oracle():
    rng = np.random.default_rng(1)
    sample = rng.standard_normal(10000)
    peaks = [90, 450, 900, 1400, 9900]  # includes edge-clipped beats both ends
    got = np.asarray(median_beat(sample.astype(np.float32), _pad(peaks), np.int32(len(peaks))))
    ref = oracle_median_beat(sample, peaks)
    np.testing.assert_allclose(got, ref.astype(np.float32), atol=1e-6)


def test_median_beat_batch():
    rng = np.random.default_rng(2)
    samples = rng.standard_normal((3, 10000)).astype(np.float32)
    peak_lists = [[200, 600, 1000], [150, 700], [5000]]
    peaks = np.stack([_pad(p) for p in peak_lists])
    n = np.array([len(p) for p in peak_lists], np.int32)
    got = np.asarray(median_beat_batch(samples, peaks, n))
    for i in range(3):
        ref = oracle_median_beat(samples[i].astype(np.float64), peak_lists[i])
        np.testing.assert_allclose(got[i], ref.astype(np.float32), atol=1e-6)


def test_segment_record():
    rec = np.arange(25000, dtype=float)
    samples, idx = segment_record(rec, 500, 20)
    assert samples.shape == (2, 10000)
    assert idx.tolist() == [[10000], [20000]]
    np.testing.assert_array_equal(samples[1], rec[10000:20000])
