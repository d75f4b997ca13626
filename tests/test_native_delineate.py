"""The C++ delineator must be index-exact against the Python host
implementation (same float64 algorithm, different implementation)."""

import numpy as np
import pytest

from native import delineate_batch_native, get_lib
from ae_waveforms_tpu.core.schema import FIDUCIAL_NAMES
from ae_waveforms_tpu.signals.delineate import delineate
from tests.test_delineate_jax import _windows


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
def test_native_matches_python_host():
    wins, peaks, n_peaks = _windows(n=5)
    out = delineate_batch_native(wins, peaks, n_peaks, 500)

    total, exact = 0, 0
    for i in range(len(wins)):
        plist = list(map(int, peaks[i][: int(n_peaks[i])]))
        host = delineate(wins[i], plist, 500)
        for key in FIDUCIAL_NAMES:
            hv = np.asarray(host[key], float)
            nv = out[key][i][: len(plist)]
            for a, b in zip(hv, nv):
                total += 1
                if (np.isnan(a) and np.isnan(b)) or a == b:
                    exact += 1
    assert total > 100
    assert exact == total, f"{total - exact}/{total} fiducials differ"


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
def test_native_padding_nan():
    wins, peaks, n_peaks = _windows(n=1)
    out = delineate_batch_native(wins, peaks, n_peaks, 500)
    k = int(n_peaks[0])
    for key in FIDUCIAL_NAMES:
        assert np.all(np.isnan(out[key][0][k:]))
