from ae_waveforms_tpu.classify.lhs import generate_lhs_params
from ae_waveforms_tpu.classify.gbt import GBTClassifier

__all__ = ["generate_lhs_params", "GBTClassifier"]
