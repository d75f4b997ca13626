"""Regenerate the committed golden fixtures (run manually, not under pytest).

Goldens freeze the float64 host pipeline's outputs on deterministic
synthetic windows: np_waves rows, delineated fiducials and np_features rows.
They catch value regressions in any of the three delineator implementations
and in the median-beat/QC path.

    python tests/make_goldens.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "extraction_golden.npz")


def build():
    from ae_waveforms_tpu.core.config import ExtractionConfig
    from ae_waveforms_tpu.core.schema import FIDUCIAL_NAMES
    from ae_waveforms_tpu.data.extract import extract_case
    from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record
    from ae_waveforms_tpu.signals.delineate import delineate
    from ae_waveforms_tpu.signals.filters import butterworth, zscore
    from ae_waveforms_tpu.signals.rpeaks import find_rpeaks_batch

    cfg = ExtractionConfig(precision="float64", delineation_engine="host")

    # per-case pipeline goldens
    rec = synthetic_ecg_record(duration_s=85.0, seed=1234)
    case = extract_case(1, rec, cfg)
    # NaN-gap record (exercises segment-split filtering + window drops)
    rec_gap = synthetic_ecg_record(duration_s=85.0, seed=4321, nan_gaps=2)
    case_gap = extract_case(2, rec_gap, cfg)

    # window-level delineation goldens
    rec2 = synthetic_ecg_record(duration_s=22.0, seed=77)
    w = zscore(rec2)
    w = butterworth(w, "high", 1.0, 500, 4, precision="float64")
    w = butterworth(w, "low", 30.0, 500, 4, precision="float64")
    win = np.asarray(zscore(w[:10000]), np.float64)
    pk, npk = find_rpeaks_batch(win[None].astype(np.float32), 500)
    plist = list(map(int, np.asarray(pk)[0][: int(npk[0])]))
    fid = delineate(win, plist, 500)

    # adversarial windows: pathological morphologies (biphasic T, absent P,
    # fused QRS, tall T) frozen with their host-f64 fiducials
    from ae_waveforms_tpu.data.synthetic import PATHOLOGICAL_WAVES, pathological_ecg_record

    patho = {}
    for morph in sorted(PATHOLOGICAL_WAVES):
        pr = pathological_ecg_record(morph, duration_s=22.0, seed=5)
        pw = zscore(pr)
        pw = butterworth(pw, "high", 1.0, 500, 4, precision="float64")
        pw = butterworth(pw, "low", 30.0, 500, 4, precision="float64")
        pwin = np.asarray(zscore(pw[:10000]), np.float64)
        ppk, pnpk = find_rpeaks_batch(pwin[None].astype(np.float32), 500)
        pl = list(map(int, np.asarray(ppk)[0][: int(pnpk[0])]))
        pfid = delineate(pwin, pl, 500)
        patho[f"patho_{morph}_window"] = pwin
        patho[f"patho_{morph}_peaks"] = np.asarray(pl)
        for k in FIDUCIAL_NAMES:
            patho[f"patho_{morph}_fid_{k}"] = np.asarray(pfid[k], float)

    np.savez(
        GOLDEN,
        waves=case.waves,
        features=case.features,
        indices=case.indices,
        gap_waves=case_gap.waves,
        gap_features=case_gap.features,
        gap_indices=case_gap.indices,
        window=win,
        peaks=np.asarray(plist),
        **{f"fid_{k}": np.asarray(fid[k], float) for k in FIDUCIAL_NAMES},
        **patho,
    )
    print(f"wrote {GOLDEN}: {len(case.waves)} case rows, {len(plist)} beats, "
          f"{len(PATHOLOGICAL_WAVES)} pathological windows")


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    build()
