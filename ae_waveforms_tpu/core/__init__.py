from ae_waveforms_tpu.core.config import (
    ExtractionConfig,
    TrainConfig,
    default_extraction_config,
)
from ae_waveforms_tpu.core.schema import ArraySet, load_arrays, save_arrays

__all__ = [
    "ExtractionConfig",
    "TrainConfig",
    "default_extraction_config",
    "ArraySet",
    "load_arrays",
    "save_arrays",
]
