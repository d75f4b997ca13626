"""Device feature rows vs host features, and the device extraction path."""

import numpy as np

from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.data.extract import extract_case
from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record
from ae_waveforms_tpu.signals.delineate import delineate
from ae_waveforms_tpu.signals.delineate_jax import delineate_batch
from ae_waveforms_tpu.signals.features import median_feature_row, morphology_features, relative_to_r
from ae_waveforms_tpu.signals.features_jax import feature_rows_batch
from tests.test_delineate_jax import _windows


def test_feature_rows_match_host_given_same_fiducials():
    """With identical fiducials, the device feature math must agree with the
    host implementation to float32 precision."""
    wins, peaks, n_peaks = _windows(n=3)
    fid = delineate_batch(wins.astype(np.float32), peaks, n_peaks, 500)
    rows_dev = np.asarray(feature_rows_batch(wins.astype(np.float32), peaks, n_peaks, fid, 500))

    for i in range(len(wins)):
        plist = list(map(int, peaks[i][: n_peaks[i]]))
        host_fid = {
            k: [np.nan if np.isnan(v) else int(v) for v in np.asarray(fid[k][i][: len(plist)])]
            for k in fid
        }
        rel = relative_to_r(wins[i].astype(np.float32), host_fid, plist, 500)
        morph = morphology_features(rel, len(plist))
        row_host = median_feature_row(rel, morph)
        a, b = rows_dev[i], row_host
        mask = ~(np.isnan(a) & np.isnan(b))
        assert np.isnan(a).tolist() == np.isnan(b).tolist()
        np.testing.assert_allclose(a[mask], b[mask], rtol=1e-4, atol=1e-4)


def test_device_extraction_path_close_to_host():
    rec = synthetic_ecg_record(duration_s=65.0, seed=11)
    host = extract_case(1, rec, ExtractionConfig(precision="float64", delineation_engine="host"))
    dev = extract_case(1, rec, ExtractionConfig(precision="float64", delineation_engine="device"))
    assert len(host.waves) == len(dev.waves)
    np.testing.assert_allclose(host.waves, dev.waves, atol=1e-6)
    # same NaN pattern and close values for the overwhelming majority of cells
    same_nan = np.isnan(host.features) == np.isnan(dev.features)
    assert same_nan.mean() > 0.97
    both = ~np.isnan(host.features) & ~np.isnan(dev.features)
    diff = np.abs(host.features[both] - dev.features[both])
    assert np.median(diff) < 1e-3
    assert (diff < 2.5).mean() > 0.95  # occasional one-sample index flips move a feature by 2 ms
