"""Loss and quality metrics (reference: loss_functions.py:4-20 plus the
SmoothL1/MSE selection in run_train.py:205-212).

All pure jnp; per-sample variants return (mean, per_sample) like the
reference's tuple contract.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mse_loss", "rmse_loss", "smooth_l1_loss", "sample_rmse_loss", "sample_prd_loss", "LOSSES"]


def mse_loss(pred, true):
    return jnp.mean((pred - true) ** 2)


def rmse_loss(pred, true):
    return jnp.sqrt(jnp.mean((pred - true) ** 2))


def smooth_l1_loss(pred, true, beta: float = 1.0):
    """torch.nn.SmoothL1Loss (the reference's 'mae' option)."""
    d = jnp.abs(pred - true)
    return jnp.mean(jnp.where(d < beta, 0.5 * d**2 / beta, d - 0.5 * beta))


def sample_rmse_loss(pred, true):
    per = jnp.sqrt(jnp.mean((pred - true) ** 2, axis=1))
    return jnp.mean(per), per


def sample_prd_loss(pred, true):
    """Percentage RMS difference per sample: 100 * sqrt(sum err^2 / sum true^2)."""
    num = jnp.sum((true - pred) ** 2, axis=1)
    den = jnp.sum(true**2, axis=1)
    per = 100.0 * jnp.sqrt(num / den)
    return jnp.mean(per), per


LOSSES = {"mse": mse_loss, "rmse": rmse_loss, "mae": smooth_l1_loss}
