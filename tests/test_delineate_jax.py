"""Device delineator vs the host (float64) reference implementation."""

import numpy as np

from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record
from ae_waveforms_tpu.signals.delineate import FIDUCIAL_KEYS, delineate
from ae_waveforms_tpu.signals.delineate_jax import delineate_batch
from ae_waveforms_tpu.signals.filters import butterworth, zscore
from ae_waveforms_tpu.signals.rpeaks import find_rpeaks_batch


def _windows(n=6, seed0=0):
    wins, peaks_list = [], []
    for s in range(n):
        rec = synthetic_ecg_record(duration_s=22.0, fs=500, seed=seed0 + s, hr_bpm=65 + 5 * s)
        rec = zscore(rec)
        rec = butterworth(rec, "high", 1.0, 500, 4, precision="float64")
        rec = butterworth(rec, "low", 30.0, 500, 4, precision="float64")
        w = np.asarray(zscore(rec[:10000]), np.float64)
        wins.append(w)
    wins = np.stack(wins)
    pk, npk = find_rpeaks_batch(wins.astype(np.float32), 500)
    return wins, np.asarray(pk), np.asarray(npk)


def test_batch_matches_host_reference():
    wins, peaks, n_peaks = _windows()
    out = delineate_batch(wins.astype(np.float32), peaks, n_peaks, 500)
    out = {k: np.asarray(v) for k, v in out.items()}

    total, exact, close = 0, 0, 0
    for i in range(len(wins)):
        plist = list(map(int, peaks[i][: n_peaks[i]]))
        host = delineate(wins[i], plist, 500)
        for key in FIDUCIAL_KEYS:
            hv = np.asarray(host[key], float)
            jv = out[key][i][: len(plist)]
            for a, b in zip(hv, jv):
                total += 1
                if np.isnan(a) and np.isnan(b):
                    exact += 1
                    close += 1
                elif not np.isnan(a) and not np.isnan(b):
                    if a == b:
                        exact += 1
                    if abs(a - b) <= 1:  # f32-vs-f64 threshold flip tolerance
                        close += 1
    assert total > 100
    # after the extended-buffer DWT fix the device delineator is index-exact
    # on this set; small headroom kept for float32 threshold flips on other data
    assert exact / total >= 0.995, (exact, close, total)


def test_shapes_and_padding():
    wins, peaks, n_peaks = _windows(n=2)
    out = delineate_batch(wins.astype(np.float32), peaks, n_peaks, 500)
    K = peaks.shape[1]
    for key in FIDUCIAL_KEYS:
        assert out[key].shape == (2, K)
        # padded beats are NaN
        assert np.all(np.isnan(np.asarray(out[key][0][int(n_peaks[0]):])))
