"""MIMIC-IV-ECG ingest (gated adapter).

The reference consumes MIMIC-IV-derived latents produced by an external
process (its README points at the PhysioNet WFDB records;
``np_latent_spaces_mimiciv.npy`` feeds main_ae_classify.py).  This adapter
closes that loop when the ``wfdb`` client is available: it reads a
10-second, 12-lead diagnostic record, selects a lead, and resamples it to
the pipeline's 500 Hz so the same extraction/AE/classify stack applies.
Offline (this image has no wfdb/network), every entry point gates cleanly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["have_wfdb", "load_mimic_record", "make_mimic_loader"]


def have_wfdb() -> bool:
    try:
        import wfdb  # noqa: F401

        return True
    except ImportError:
        return False


def load_mimic_record(
    record_path: str,
    lead: str = "II",
    target_fs: int = 500,
) -> Optional[np.ndarray]:
    """One WFDB record -> (T,) float64 signal at target_fs, or None when the
    lead is missing/empty."""
    import wfdb

    rec = wfdb.rdrecord(record_path)
    names = [s.upper() for s in rec.sig_name]
    if lead.upper() not in names:
        return None
    sig = np.asarray(rec.p_signal[:, names.index(lead.upper())], float)
    if not np.isfinite(sig).any():
        return None
    fs = float(rec.fs)
    if fs != target_fs:
        n_out = int(round(len(sig) * target_fs / fs))
        x_out = np.linspace(0.0, 1.0, n_out, endpoint=False)
        x_in = np.linspace(0.0, 1.0, len(sig), endpoint=False)
        sig = np.interp(x_out, x_in, sig)
    return sig


def make_mimic_loader(record_paths: Sequence[str], lead: str = "II", target_fs: int = 500):
    """case_id -> record callable over a list of WFDB record paths (case ids
    index the list)."""
    if not have_wfdb():
        raise RuntimeError("wfdb client not available in this environment")

    def load(case_id: int):
        if not 0 <= case_id < len(record_paths):
            return None
        return load_mimic_record(record_paths[case_id], lead, target_fs)

    return load
