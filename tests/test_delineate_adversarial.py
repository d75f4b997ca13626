"""Adversarial delineation fixtures: pathological beat morphologies
(biphasic T, absent P, fused QRS, tall T) run through all available
delineator implementations with a cross-implementation agreement audit
plus structural invariants (SURVEY §7.1 parity-risk hardening).

The three implementations (host float64 python, C++ native, device JAX)
implement the same published DWT algorithm; on pathological shapes small
float32 threshold flips can move an index, so the device check uses a
close-rate (|Δ| <= 1 sample) with a high exactness floor, and every
disagreement is printed for audit.
"""

import numpy as np
import pytest

from ae_waveforms_tpu.data.synthetic import (
    PATHOLOGICAL_WAVES,
    STRESSORS,
    pathological_ecg_record,
    stressed_ecg_record,
)
from ae_waveforms_tpu.signals.delineate import FIDUCIAL_KEYS, delineate
from ae_waveforms_tpu.signals.delineate_jax import delineate_batch
from ae_waveforms_tpu.signals.filters import butterworth, zscore
from ae_waveforms_tpu.signals.rpeaks import find_rpeaks_batch

MORPHOLOGIES = sorted(PATHOLOGICAL_WAVES)
#: morphology classes + record-level stressor classes; per-class measured
#: device-vs-host exactness floors (PARITY.md "Delineation stress envelope")
ALL_CLASSES = MORPHOLOGIES + list(STRESSORS)


def _record_for(cls: str, seed: int) -> np.ndarray:
    if cls in PATHOLOGICAL_WAVES:
        return pathological_ecg_record(cls, duration_s=22.0, seed=seed)
    return stressed_ecg_record(cls, duration_s=22.0, seed=seed)


def _windows_for(cls: str, n: int = 2):
    wins = []
    for s in range(n):
        rec = _record_for(cls, seed=7 * s + 1)
        rec = zscore(rec)
        rec = butterworth(rec, "high", 1.0, 500, 4, precision="float64")
        rec = butterworth(rec, "low", 30.0, 500, 4, precision="float64")
        wins.append(np.asarray(zscore(rec[:10000]), np.float64))
    wins = np.stack(wins)
    pk, npk = find_rpeaks_batch(wins.astype(np.float32), 500)
    return wins, np.asarray(pk), np.asarray(npk)


@pytest.mark.parametrize("morphology", ALL_CLASSES)
def test_rpeaks_found_on_pathological(morphology):
    _, _, n_peaks = _windows_for(morphology)
    # ~22 s at 70 bpm -> ~25 beats; all morphologies keep a detectable R
    assert (n_peaks >= 15).all(), (morphology, n_peaks)


@pytest.mark.parametrize("morphology", ALL_CLASSES)
def test_host_structural_invariants(morphology):
    """Onset <= peak <= offset for every detected P/T wave, QRS boundaries
    bracket R, and fiducials are strictly inside the window."""
    wins, peaks, n_peaks = _windows_for(morphology)
    for i in range(len(wins)):
        plist = list(map(int, peaks[i][: n_peaks[i]]))
        out = delineate(wins[i], plist, 500)
        for on_k, pk_k, off_k in [
            ("ECG_P_Onsets", "ECG_P_Peaks", "ECG_P_Offsets"),
            ("ECG_T_Onsets", "ECG_T_Peaks", "ECG_T_Offsets"),
        ]:
            on = np.asarray(out[on_k], float)
            pk = np.asarray(out[pk_k], float)
            off = np.asarray(out[off_k], float)
            both = ~np.isnan(on) & ~np.isnan(pk)
            assert (on[both] <= pk[both]).all(), (morphology, on_k)
            both = ~np.isnan(pk) & ~np.isnan(off)
            assert (pk[both] <= off[both]).all(), (morphology, off_k)
        r_on = np.asarray(out["ECG_R_Onsets"], float)
        r_off = np.asarray(out["ECG_R_Offsets"], float)
        r = np.asarray(plist, float)
        m = ~np.isnan(r_on)
        assert (r_on[m] <= r[m]).all(), morphology
        m = ~np.isnan(r_off)
        assert (r_off[m] >= r[m]).all(), morphology
        for key in FIDUCIAL_KEYS:
            v = np.asarray(out[key], float)
            v = v[~np.isnan(v)]
            assert ((v >= 0) & (v < 10000)).all(), (morphology, key)


@pytest.mark.parametrize("morphology", ALL_CLASSES)
def test_device_agrees_with_host(morphology):
    wins, peaks, n_peaks = _windows_for(morphology)
    out = delineate_batch(wins.astype(np.float32), peaks, n_peaks, 500)
    out = {k: np.asarray(v) for k, v in out.items()}

    total, exact, close, audit = 0, 0, 0, []
    for i in range(len(wins)):
        plist = list(map(int, peaks[i][: n_peaks[i]]))
        host = delineate(wins[i], plist, 500)
        for key in FIDUCIAL_KEYS:
            hv = np.asarray(host[key], float)
            jv = out[key][i][: len(plist)]
            for b, (a, c) in enumerate(zip(hv, jv)):
                total += 1
                if np.isnan(a) and np.isnan(c):
                    exact += 1
                    close += 1
                elif not np.isnan(a) and not np.isnan(c):
                    exact += a == c
                    close += abs(a - c) <= 1
                    if a != c:
                        audit.append((key, i, b, a, c))
                else:
                    audit.append((key, i, b, a, c))
    if audit:
        print(f"\n{morphology}: {len(audit)} device-vs-host disagreements of {total}:")
        for row in audit[:20]:
            print("  ", row)
    assert total > 100
    # per-class measured envelope (PARITY.md "Delineation stress envelope"):
    # every morphology + stressor class is 100% index-exact at n=4 windows
    # EXCEPT wander_edge (0.9946) — a 0.9 Hz / 0.5 mV wander surviving the
    # 1 Hz high-pass leaves the f32 RMS detection thresholds near their
    # flip point, and ONE beat's detect/no-detect flip cascades through
    # that beat's dependent fiducials (NaN-vs-value disagreements, so the
    # close-rate equals the exact-rate for this class)
    floor = 0.985 if morphology == "wander_edge" else 0.995
    assert exact / total >= floor, (morphology, exact, close, total)
    assert close / total >= floor, (morphology, exact, close, total)


@pytest.mark.parametrize("morphology", ALL_CLASSES)
def test_native_agrees_with_host(morphology):
    from native import delineate_batch_native, get_lib

    if get_lib() is None:
        pytest.skip("no C++ toolchain")
    wins, peaks, n_peaks = _windows_for(morphology)
    out = delineate_batch_native(wins, peaks, n_peaks, 500)
    mismatches = []
    for i in range(len(wins)):
        plist = list(map(int, peaks[i][: int(n_peaks[i])]))
        host = delineate(wins[i], plist, 500)
        for key in FIDUCIAL_KEYS:
            hv = np.asarray(host[key], float)
            nv = out[key][i][: len(plist)]
            for a, b in zip(hv, nv):
                if not ((np.isnan(a) and np.isnan(b)) or a == b):
                    mismatches.append((key, i, a, b))
    assert not mismatches, f"{morphology}: {mismatches[:10]}"
