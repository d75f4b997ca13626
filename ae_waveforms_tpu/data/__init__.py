from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record
from ae_waveforms_tpu.data.extract import extract_case, extract_cases
from ae_waveforms_tpu.data.arrays import build_arrays

__all__ = ["synthetic_ecg_record", "extract_case", "extract_cases", "build_arrays"]
