from ae_waveforms_tpu.train.losses import mse_loss, rmse_loss, sample_prd_loss, sample_rmse_loss, smooth_l1_loss
from ae_waveforms_tpu.train.ranger import ranger
from ae_waveforms_tpu.train.schedules import (
    cosine_annealing_warm_restarts,
    cosine_annealing_warmup_hard_restarts,
    step_lr,
)

__all__ = [
    "mse_loss",
    "rmse_loss",
    "smooth_l1_loss",
    "sample_rmse_loss",
    "sample_prd_loss",
    "ranger",
    "step_lr",
    "cosine_annealing_warm_restarts",
    "cosine_annealing_warmup_hard_restarts",
]
