"""Golden-fixture regression tests: the float64 host pipeline must keep
producing the committed values; the native and device delineators must keep
agreeing with the frozen fiducials."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "extraction_golden.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="goldens not generated")


def _load():
    return np.load(GOLDEN)


def test_case_pipeline_matches_golden():
    from ae_waveforms_tpu.core.config import ExtractionConfig
    from ae_waveforms_tpu.data.extract import extract_case
    from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record

    z = _load()
    rec = synthetic_ecg_record(duration_s=85.0, seed=1234)
    case = extract_case(1, rec, ExtractionConfig(precision="float64", delineation_engine="host"))
    np.testing.assert_allclose(case.waves, z["waves"], atol=1e-6)
    a, b = case.features, z["features"]
    assert np.isnan(a).tolist() == np.isnan(b).tolist()
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], atol=1e-9)
    np.testing.assert_array_equal(case.indices, z["indices"])


def test_nan_gap_case_matches_golden():
    from ae_waveforms_tpu.core.config import ExtractionConfig
    from ae_waveforms_tpu.data.extract import extract_case
    from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record

    z = _load()
    if "gap_waves" not in z.files:
        pytest.skip("golden predates the NaN-gap case")
    rec = synthetic_ecg_record(duration_s=85.0, seed=4321, nan_gaps=2)
    case = extract_case(2, rec, ExtractionConfig(precision="float64", delineation_engine="host"))
    np.testing.assert_allclose(case.waves, z["gap_waves"], atol=1e-6)
    np.testing.assert_array_equal(case.indices, z["gap_indices"])


def test_host_delineator_matches_golden_fiducials():
    from ae_waveforms_tpu.core.schema import FIDUCIAL_NAMES
    from ae_waveforms_tpu.signals.delineate import delineate

    z = _load()
    fid = delineate(z["window"], list(map(int, z["peaks"])), 500)
    for k in FIDUCIAL_NAMES:
        got = np.asarray(fid[k], float)
        want = z[f"fid_{k}"]
        assert np.isnan(got).tolist() == np.isnan(want).tolist()
        m = ~np.isnan(want)
        np.testing.assert_array_equal(got[m], want[m])


def test_native_delineator_matches_golden_fiducials():
    from native import delineate_batch_native, get_lib

    if get_lib() is None:
        pytest.skip("no C++ toolchain")
    from ae_waveforms_tpu.core.schema import FIDUCIAL_NAMES

    z = _load()
    peaks = np.full((1, 128), -1, np.int32)
    peaks[0, : len(z["peaks"])] = z["peaks"]
    out = delineate_batch_native(z["window"][None], peaks, np.array([len(z["peaks"])], np.int32), 500)
    for k in FIDUCIAL_NAMES:
        got = out[k][0][: len(z["peaks"])]
        want = z[f"fid_{k}"]
        assert np.isnan(got).tolist() == np.isnan(want).tolist()
        m = ~np.isnan(want)
        np.testing.assert_array_equal(got[m], want[m])


def test_pathological_windows_match_golden_fiducials():
    """Host delineator regression on the adversarial morphologies."""
    from ae_waveforms_tpu.core.schema import FIDUCIAL_NAMES
    from ae_waveforms_tpu.data.synthetic import PATHOLOGICAL_WAVES
    from ae_waveforms_tpu.signals.delineate import delineate

    z = _load()
    if not any(f.startswith("patho_") for f in z.files):
        pytest.skip("golden predates the pathological fixtures")
    for morph in sorted(PATHOLOGICAL_WAVES):
        win = z[f"patho_{morph}_window"]
        peaks = list(map(int, z[f"patho_{morph}_peaks"]))
        fid = delineate(win, peaks, 500)
        for k in FIDUCIAL_NAMES:
            got = np.asarray(fid[k], float)
            want = z[f"patho_{morph}_fid_{k}"]
            assert np.isnan(got).tolist() == np.isnan(want).tolist(), (morph, k)
            m = ~np.isnan(want)
            np.testing.assert_array_equal(got[m], want[m], err_msg=f"{morph}/{k}")
