"""End-to-end extraction pipeline tests on synthetic records."""

import numpy as np

from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.core.schema import ArraySet
from ae_waveforms_tpu.data.arrays import build_arrays
from ae_waveforms_tpu.data.extract import extract_case, extract_cases
from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record


def _cfg(**kw):
    return ExtractionConfig(precision="float64", **kw)


def test_extract_case_end_to_end():
    rec = synthetic_ecg_record(duration_s=85.0, seed=0)
    r = extract_case(1, rec, _cfg())
    assert r.n_windows_raw == 4
    assert 1 <= len(r.waves) <= 4
    assert r.waves.shape[1] == 320
    assert r.features.shape == (len(r.waves), 35)
    # median beats are z-scored-ish waveforms with an R peak near index 106
    peak_pos = np.argmax(r.waves, axis=1)
    assert np.all(np.abs(peak_pos - 106) < 8)
    # fiducial medians: R onset (col 8=x) should be negative ms, T peak x positive
    assert np.all(r.features[:, 14] > 0)  # T peak x after R
    # most features should be finite
    assert np.isfinite(r.features).mean() > 0.8


def test_extract_cache_roundtrip(tmp_path):
    rec = synthetic_ecg_record(duration_s=45.0, seed=1)
    cfg = _cfg()
    r1 = extract_case(7, rec, cfg, cache_dir=str(tmp_path))
    r2 = extract_case(7, None, cfg, cache_dir=str(tmp_path))  # cache hit, no record needed
    np.testing.assert_array_equal(r1.waves, r2.waves)
    np.testing.assert_array_equal(r1.features, r2.features)
    np.testing.assert_array_equal(r1.indices, r2.indices)


def test_extract_with_nan_gaps():
    rec = synthetic_ecg_record(duration_s=65.0, seed=2, nan_gaps=2)
    r = extract_case(3, rec, _cfg())
    # NaN-containing windows are dropped, others survive
    assert len(r.waves) <= r.n_windows_raw
    assert np.isfinite(r.waves).all()


def test_build_arrays_contract():
    cfg = _cfg()
    cases = extract_cases(
        [1, 2],
        lambda cid: synthetic_ecg_record(duration_s=45.0, seed=cid),
        cfg,
    )
    arrays = build_arrays(cases)
    assert isinstance(arrays, ArraySet)
    assert arrays.waves.dtype == np.float32
    assert set(np.unique(arrays.info[:, 0])) <= {1.0, 2.0}
    # window-end indices are multiples of 10000
    assert np.all(arrays.info[:, 1] % 10000 == 0)


def test_save_load_roundtrip(tmp_path):
    from ae_waveforms_tpu.core.schema import load_arrays, save_arrays

    cases = extract_cases([5], lambda cid: synthetic_ecg_record(duration_s=45.0, seed=9), _cfg())
    arrays = build_arrays(cases)
    save_arrays(arrays, str(tmp_path))
    back = load_arrays(str(tmp_path))
    np.testing.assert_allclose(back.waves, arrays.waves)
    np.testing.assert_allclose(back.features, arrays.features)


def test_batched_extraction_matches_per_case():
    """Cross-case batched extraction must produce identical arrays to the
    per-case path (device kernels are per-window independent)."""
    cfg = _cfg()
    loader = lambda cid: synthetic_ecg_record(duration_s=45.0, seed=100 + cid)  # noqa: E731
    ids = [1, 2, 3, 4]
    per_case = extract_cases(ids, loader, cfg)
    batched = extract_cases(ids, loader, cfg, batched=True, windows_per_batch=3)
    assert len(per_case) == len(batched)
    for a, b in zip(per_case, batched):
        assert a.case_id == b.case_id
        np.testing.assert_allclose(a.waves, b.waves, atol=1e-6)
        mask = ~(np.isnan(a.features) & np.isnan(b.features))
        np.testing.assert_allclose(a.features[mask], b.features[mask], atol=1e-9)
        np.testing.assert_array_equal(a.indices, b.indices)
        assert a.n_windows_raw == b.n_windows_raw


def test_parallel_preprocessing_prefetch():
    """Background prefetch produces identical results to the plain loader."""
    cfg_seq = _cfg()
    cfg_par = ExtractionConfig(precision="float64", parallel_preprocessing=True)
    loader = lambda cid: synthetic_ecg_record(duration_s=45.0, seed=200 + cid)  # noqa: E731
    a = extract_cases([1, 2, 3], loader, cfg_seq)
    b = extract_cases([1, 2, 3], loader, cfg_par)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x.waves, y.waves, atol=1e-9)
        np.testing.assert_array_equal(x.indices, y.indices)


def test_batched_device_engine_chunking_matches_per_case():
    """The device-engine flush path (pooled filtering + fixed
    windows_per_batch chunks with a padded remainder) must match the
    per-case device path, across a chunk boundary."""
    cfg = ExtractionConfig(precision="float32", delineation_engine="device")
    loader = lambda cid: synthetic_ecg_record(duration_s=65.0, seed=300 + cid)  # noqa: E731
    ids = [1, 2, 3]
    per_case = extract_cases(ids, loader, cfg)
    batched = extract_cases(ids, loader, cfg, batched=True, windows_per_batch=4)
    assert len(per_case) == len(batched)
    assert sum(r.n_windows_raw for r in batched) > 4  # crosses a chunk boundary
    for a, b in zip(per_case, batched):
        assert a.case_id == b.case_id
        np.testing.assert_allclose(a.waves, b.waves, atol=2e-5)
        mask = ~(np.isnan(a.features) & np.isnan(b.features))
        np.testing.assert_allclose(a.features[mask], b.features[mask], atol=1e-4)
        np.testing.assert_array_equal(a.indices, b.indices)
        assert a.n_windows_raw == b.n_windows_raw


def test_batched_device_streaming_multi_chunk_case():
    """A single case spanning several full chunks (carry buffer + persistent
    in-flight queue) must match the per-case path, and results must come
    back in case_ids order."""
    cfg = ExtractionConfig(precision="float32", delineation_engine="device")

    def loader(cid):
        # case 7 is long (10 windows); the others short
        dur = 220.0 if cid == 7 else 45.0
        return synthetic_ecg_record(duration_s=dur, seed=400 + cid)

    ids = [5, 7, 9, 11]
    per_case = extract_cases(ids, loader, cfg)
    batched = extract_cases(ids, loader, cfg, batched=True, windows_per_batch=3)
    assert [r.case_id for r in batched] == ids
    long_raw = next(r for r in batched if r.case_id == 7).n_windows_raw
    assert long_raw > 3 * 2  # the long case alone spans >2 chunks
    for a, b in zip(per_case, batched):
        assert a.case_id == b.case_id
        np.testing.assert_allclose(a.waves, b.waves, atol=2e-5)
        mask = ~(np.isnan(a.features) & np.isnan(b.features))
        np.testing.assert_allclose(a.features[mask], b.features[mask], atol=1e-4)
        np.testing.assert_array_equal(a.indices, b.indices)
        assert a.n_windows_raw == b.n_windows_raw


def test_batched_device_high_hr_overflow_redispatch():
    """A window faster than the light beat-width profile (HR > 144 -> >48
    peaks per 20 s) must trigger the full-width re-dispatch and still match
    the per-case path (the light program's truncated result is discarded)."""
    cfg = ExtractionConfig(precision="float32", delineation_engine="device")

    def loader(cid):
        hr = 170.0 if cid == 2 else 70.0  # ~56 peaks/window at 170 bpm
        return synthetic_ecg_record(duration_s=45.0, seed=500 + cid, hr_bpm=hr)

    ids = [1, 2, 3]
    per_case = extract_cases(ids, loader, cfg)
    batched = extract_cases(ids, loader, cfg, batched=True, windows_per_batch=4)
    assert [r.case_id for r in batched] == ids
    for a, b in zip(per_case, batched):
        np.testing.assert_allclose(a.waves, b.waves, atol=2e-5)
        mask = ~(np.isnan(a.features) & np.isnan(b.features))
        np.testing.assert_allclose(a.features[mask], b.features[mask], atol=1e-4)
        assert a.n_windows_raw == b.n_windows_raw


def test_batched_device_consumer_error_does_not_hang_producer():
    """A dispatch failure mid-stream must propagate promptly: the prefetch
    producer used to stay blocked in q.put on the full queue (no stop
    signal), stalling the re-raise on the 60 s thread-join and leaking the
    thread."""
    import threading
    import time

    import pytest

    import ae_waveforms_tpu.data.extract as extract_mod

    def boom_kernel(*a, **k):
        raise RuntimeError("injected dispatch failure")

    cfg = ExtractionConfig(precision="float32", delineation_engine="device")
    loader = lambda cid: synthetic_ecg_record(duration_s=45.0, seed=600 + cid)  # noqa: E731
    old = extract_mod._WINDOW_BATCH_KERNEL
    extract_mod._WINDOW_BATCH_KERNEL = boom_kernel
    try:
        t0 = time.perf_counter()
        with pytest.raises(RuntimeError, match="injected dispatch failure"):
            # enough cases to overfill the 64-slot queue after the consumer
            # dies at the very first dispatch (windows_per_batch=4)
            extract_mod.extract_cases_batched(
                list(range(150)), loader, cfg, cache_dir=None, windows_per_batch=4
            )
        elapsed = time.perf_counter() - t0
    finally:
        extract_mod._WINDOW_BATCH_KERNEL = old
    assert elapsed < 30.0, f"error took {elapsed:.1f}s to propagate (producer hang)"
    time.sleep(0.5)
    assert not any(t.name == "extract-prep" for t in threading.enumerate())
