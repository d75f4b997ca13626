"""Analytic FLOPs models for the benchmarked programs + device peaks.

Pure Python (no jax import): ``bench.py``'s parent process uses these to
print an MFU column next to every throughput number, so "latency-bound at
B=128" / "MXU-bound for conv" are quantitative claims, not narrative.

Conventions (the standard MFU accounting):
- one multiply-add = 2 FLOPs;
- only matmul/conv FLOPs count ("useful" model FLOPs) — elementwise,
  gather, and reduction work is excluded, so MFU is a lower bound;
- a training step costs 3x the forward matmul FLOPs (backward needs two
  matmuls per forward matmul);
- the denominator is the device's bf16 MXU peak (JAX's DEFAULT f32 matmul
  precision on TPU executes bf16 multiplies with f32 accumulation, so the
  bf16 peak is the attainable ceiling for every benched program).

Reference workloads these model: the AE training step
(/root/reference/functions_ae/run_train.py:282-364 at main_ae.py:58-66
defaults), the DL-classifier epoch (main_dl_classify.py:63-105), and the
GBT histogram sweep (main_ae_classify.py:57-77).
"""

from __future__ import annotations

import os

__all__ = [
    "lstm_layer_fwd_flops", "lstm_ae_fwd_flops_per_sample",
    "lstm_ae_train_flops_per_sample", "conv_ae_fwd_flops_per_sample",
    "conv_ae_train_flops_per_sample", "dl_classifier_fwd_flops_per_sample",
    "dl_classifier_train_flops_per_model_epoch", "gbt_hist_flops_per_fit",
    "device_peak_flops", "mfu",
]

# bf16 MXU peak per chip, FLOP/s (public TPU specs)
PEAK_BF16 = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def device_peak_flops(gen: str | None = None) -> float:
    """Peak bf16 FLOP/s for the target generation; defaults to the
    PALLAS_AXON_TPU_GEN env var (the tunnel's target), then v5e."""
    gen = gen or os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return PEAK_BF16.get(gen, PEAK_BF16["v5e"])


def lstm_layer_fwd_flops(T: int, d_in: int, d_h: int) -> int:
    """One LSTM layer forward, one sample: T steps of the input projection
    (d_in -> 4*d_h) and the recurrent projection (d_h -> 4*d_h)."""
    return 2 * T * 4 * d_h * (d_in + d_h)


def lstm_ae_fwd_flops_per_sample(T: int = 320, latent: int = 10,
                                 h1: int = 128, h2: int = 64) -> int:
    """models/lstm_ae.py: enc 1->h1->h2->latent, dec latent->h2->h1->1."""
    return (
        lstm_layer_fwd_flops(T, 1, h1)
        + lstm_layer_fwd_flops(T, h1, h2)
        + lstm_layer_fwd_flops(T, h2, latent)
        + lstm_layer_fwd_flops(T, latent, h2)
        + lstm_layer_fwd_flops(T, h2, h1)
        + lstm_layer_fwd_flops(T, h1, 1)
        + 2 * T  # the 1x1 output linear
    )


def lstm_ae_train_flops_per_sample(T: int = 320, latent: int = 10) -> int:
    return 3 * lstm_ae_fwd_flops_per_sample(T, latent)


def _conv_flops(k: int, c_in: int, c_out: int, l_out: int) -> int:
    return 2 * k * c_in * c_out * l_out


def conv_ae_fwd_flops_per_sample(latent: int = 10) -> int:
    """models/conv_ae.py at T=320 (lengths pinned by the upsample sizes);
    transpose convs counted over their INPUT length (each input column
    feeds k outputs)."""
    enc = (
        _conv_flops(3, 1, 16, 160) + _conv_flops(3, 16, 32, 40)
        + _conv_flops(3, 32, 64, 10) + _conv_flops(3, 64, 128, 3)
        + _conv_flops(1, 128, latent, 1)
    )
    dec = (
        _conv_flops(1, latent, 128, 1) + _conv_flops(3, 128, 64, 3)
        + _conv_flops(3, 64, 32, 10) + _conv_flops(3, 32, 16, 40)
        + _conv_flops(3, 16, 1, 160)
    )
    return enc + dec


def conv_ae_train_flops_per_sample(latent: int = 10) -> int:
    return 3 * conv_ae_fwd_flops_per_sample(latent)


def dl_classifier_fwd_flops_per_sample(T: int = 320) -> int:
    """models/lstm_classifier.py: LSTM 1->128->64->64, attention linear
    64->1 per step, fc 64->32->1."""
    return (
        lstm_layer_fwd_flops(T, 1, 128)
        + lstm_layer_fwd_flops(T, 128, 64)
        + lstm_layer_fwd_flops(T, 64, 64)
        + 2 * T * 64  # attention scores
        + 2 * 64 * 32 + 2 * 32  # head
    )


def dl_classifier_train_flops_per_model_epoch(
    n_train: int = 3200, n_val: int = 800, T: int = 320
) -> int:
    """One epoch of one model in the fused block: train fwd+bwd over the
    epoch's samples + the validation forward."""
    f = dl_classifier_fwd_flops_per_sample(T)
    return 3 * f * n_train + f * n_val


def gbt_hist_flops_per_fit(n: int, F: int, n_bins: int, max_depth: int,
                           n_estimators: int) -> int:
    """Dominant MXU work of one GBT fit: the per-level left-child histogram
    contraction A (2*half, n) @ onehot (n, F*n_bins) summed over levels
    0..max_depth-1 (half = 2^max(d-1, 0)), per tree.  Routing expansions,
    prefix-sum matmuls and split scoring are excluded (lower bound)."""
    fb = F * n_bins
    per_tree = 0
    for d in range(max_depth):
        half = max(2 ** max(d - 1, 0), 1)
        per_tree += 2 * (2 * half) * n * fb
    return per_tree * n_estimators


def mfu(achieved_flops_per_s: float, gen: str | None = None) -> float:
    return achieved_flops_per_s / device_peak_flops(gen)
