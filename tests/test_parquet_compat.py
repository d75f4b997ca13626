"""Reference parquet-cache ingestion: round-trip through a synthetic cache
written in the upstream on-disk layout."""

import numpy as np
import pandas as pd
import pytest

from ae_waveforms_tpu.core.schema import FIDUCIAL_NAMES, MORPHOLOGY_NAMES
from ae_waveforms_tpu.data.parquet_compat import (
    arrays_from_reference_cache,
    load_reference_case,
)


def _write_reference_style_parquet(path, n, rng):
    data = {
        "ecg_sample": [rng.standard_normal(100).tolist() for _ in range(n)],
        "indices_samples": [[10000 * (i + 1)] for i in range(n)],
        "ECG_R_Peaks": [[10, 50, 90]] * n,
        "ecg_sample_median": [rng.standard_normal(320).astype(np.float32).tolist() for _ in range(n)],
    }
    for name in FIDUCIAL_NAMES:
        data[name] = [{"x": float(rng.normal()), "y": float(rng.normal())} for _ in range(n)]
    for name in MORPHOLOGY_NAMES:
        data[name] = rng.standard_normal(n).tolist()
    pd.DataFrame(data).to_parquet(path, engine="pyarrow")


def test_load_reference_case(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "42.parquet"
    _write_reference_style_parquet(str(p), 3, rng)
    case = load_reference_case(str(p))
    assert case.case_id == 42
    assert case.waves.shape == (3, 320)
    assert case.features.shape == (3, 35)
    np.testing.assert_array_equal(case.indices, [10000, 20000, 30000])
    # fiducial (x, y) pairs land in columns 0..19 in schema order
    df = pd.read_parquet(str(p))
    assert case.features[0, 0] == df[FIDUCIAL_NAMES[0]][0]["x"]
    assert case.features[0, 1] == df[FIDUCIAL_NAMES[0]][0]["y"]
    assert case.features[0, 20] == pytest.approx(df[MORPHOLOGY_NAMES[0]][0])


def test_arrays_from_reference_cache(tmp_path):
    rng = np.random.default_rng(1)
    for cid, n in [(7, 2), (8, 4)]:
        _write_reference_style_parquet(str(tmp_path / f"{cid}.parquet"), n, rng)
    arrays = arrays_from_reference_cache(str(tmp_path))
    assert len(arrays) == 6
    assert set(np.unique(arrays.info[:, 0])) == {7.0, 8.0}
    assert arrays.waves.dtype == np.float32
