"""External neurokit2 oracle tests (round-2 VERDICT #4).

No neurokit2 wheel exists in the build image (zero egress), so these tests
SKIP themselves unless ``import neurokit2`` succeeds — they are the
ready-to-activate parity harness for any environment that has the library.
When active they pin the two third-party algorithms this framework
reimplements from scratch:

- ``nk.ecg_findpeaks`` (default "neurokit" method) vs ``signals/rpeaks.py``
  (reference call site: remove_samples.py:50-51);
- ``nk.ecg_delineate`` (library-default DWT method) vs
  ``signals/delineate.py``, including the 500 -> 2000 Hz analysis-rate
  resampler whose upstream method is a library choice
  (reference call site: data_extract_vitaldb.py:131) — the resample
  sensitivity probe reports which RESAMPLE_METHODS entry matches upstream;
- the downstream (B, 35) ``np_features`` rows to the 1e-5 driver target.
"""

import numpy as np
import pytest

nk = pytest.importorskip("neurokit2")

from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record
from ae_waveforms_tpu.data.extract import extract_case
from ae_waveforms_tpu.signals.delineate import RESAMPLE_METHODS, delineate
from ae_waveforms_tpu.signals.rpeaks import find_rpeaks
from ae_waveforms_tpu.signals.segment import segment_record

FS = 500


def _rp(w):
    """Unpadded R-peak indices: find_rpeaks returns (padded peaks, n_peaks)."""
    peaks, n = find_rpeaks(w, FS)
    return np.asarray(peaks)[: int(n)]


def _windows(n=6, duration_s=120.0, seed=0):
    cfg = ExtractionConfig()
    rec = synthetic_ecg_record(duration_s=duration_s, seed=seed)
    from ae_waveforms_tpu.data.extract import preprocess_record

    samples, _ = segment_record(preprocess_record(rec, cfg), FS, cfg.sample_length)
    with np.errstate(all="ignore"):
        mu = np.nanmean(samples, axis=1, keepdims=True)
        sd = np.nanstd(samples, axis=1, keepdims=True)
        samples = (samples - mu) / sd
    return samples[:n]


def test_rpeaks_match_nk():
    for i, w in enumerate(_windows()):
        ours = _rp(w)
        theirs = nk.ecg_findpeaks(w, sampling_rate=FS)["ECG_R_Peaks"]
        np.testing.assert_array_equal(ours, np.asarray(theirs), err_msg=f"window {i}")


def test_delineation_matches_nk_dwt():
    mismatches = total = 0
    for w in _windows():
        rp = _rp(w)
        if len(rp) == 0:
            continue
        ours = delineate(w, rp, FS)
        _, theirs = nk.ecg_delineate(w, rpeaks=rp, sampling_rate=FS)
        for key, vals in ours.items():
            ref_vals = theirs[key]
            assert len(ref_vals) == len(vals)
            for a, b in zip(vals, ref_vals):
                total += 1
                a_nan, b_nan = np.isnan(a) if a == a else True, np.isnan(b) if b == b else True
                if a_nan != b_nan or (not a_nan and int(a) != int(b)):
                    mismatches += 1
    assert total > 0
    # fiducial indices feed ms-scale features; demand >= 99% exact agreement
    assert mismatches / total < 0.01, f"{mismatches}/{total} fiducials differ"


def test_feature_rows_match_nk_pipeline():
    """Full np_features parity vs a neurokit2-backed reference pipeline on
    the same windows (the driver's 1e-5 target, BASELINE.md)."""
    from ae_waveforms_tpu.signals.features import (
        median_feature_row,
        morphology_features,
        relative_to_r,
    )

    cfg = ExtractionConfig(delineation_engine="python")
    rec = synthetic_ecg_record(duration_s=120.0, seed=3)
    res = extract_case(0, rec, cfg, cache_dir=None)

    # reference-equivalent rows built from nk's delineation output, using
    # the framework's own QC so the surviving-window set matches
    samples = _windows(n=10**9, duration_s=120.0, seed=3)
    from ae_waveforms_tpu.data.extract import _pad_batch
    from ae_waveforms_tpu.signals.qc import qc_mask
    from ae_waveforms_tpu.signals.rpeaks import find_rpeaks_batch

    samples_f32, n_real = _pad_batch(samples.astype(np.float32))
    peaks, n_peaks = find_rpeaks_batch(samples_f32, FS)
    keep = np.asarray(
        qc_mask(samples_f32, peaks, n_peaks, FS, cfg.pvc_threshold, cfg.sd_threshold_ecg)
    )[:n_real]

    rows_ref = []
    for w in samples[keep]:
        rp = _rp(w)
        if len(rp) == 0:
            continue
        _, fid = nk.ecg_delineate(w, rpeaks=rp, sampling_rate=FS)
        fid = {k: list(v) for k, v in fid.items()}
        rel = relative_to_r(w, fid, list(rp), FS)
        rows_ref.append(median_feature_row(rel, morphology_features(rel, len(rp))))
    rows_ref = np.asarray(rows_ref)

    assert rows_ref.shape == res.features.shape
    both = ~(np.isnan(rows_ref) & np.isnan(res.features))
    np.testing.assert_allclose(res.features[both], rows_ref[both], atol=1e-5)


def test_resample_sensitivity_probe():
    """Report which analysis-rate resampler reproduces upstream: runs the
    delineator under every RESAMPLE_METHODS entry and asserts at least one
    matches nk's fiducials >= 99% exactly (documents the 'linear' assumption
    if linear wins; flags it if another method does)."""
    agreement = {}
    for method in RESAMPLE_METHODS:
        mism = total = 0
        for w in _windows(n=4):
            rp = _rp(w)
            if len(rp) == 0:
                continue
            ours = delineate(w, rp, FS, resample_method=method)
            _, theirs = nk.ecg_delineate(w, rpeaks=rp, sampling_rate=FS)
            for key, vals in ours.items():
                for a, b in zip(vals, theirs[key]):
                    total += 1
                    a_nan = not (a == a)
                    b_nan = not (b == b)
                    if a_nan != b_nan or (not a_nan and int(a) != int(b)):
                        mism += 1
        agreement[method] = 1.0 - mism / max(total, 1)
    best = max(agreement, key=agreement.get)
    assert agreement[best] >= 0.99, f"no resampler matches upstream: {agreement}"
    assert best == "linear" or agreement["linear"] >= 0.99, (
        f"upstream resampler is NOT linear: {agreement} — update the "
        "RESAMPLE_METHODS default and the native/device engines"
    )
