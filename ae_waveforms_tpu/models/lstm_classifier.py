"""End-to-end LSTM classifier (capability twin of
functions_dl/model_classes.py:8-32).

3-layer LSTM 1->128->64->64 with inter-layer dropout, softmax attention
pooling over time, BatchNorm1d, FC 64->32 (ReLU), FC 32->1, sigmoid.

BatchNorm carries running statistics, so apply() returns (probs, new_state);
torch semantics: batch stats normalise in train mode (biased variance),
running stats update with momentum 0.1 using the unbiased variance.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ae_waveforms_tpu.models.layers import (
    dropout,
    linear_apply,
    linear_init,
    lstm_apply,
    lstm_apply_remat,
    lstm_init,
)

__all__ = ["init", "forward"]

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def init(key, dropout_rate: float = 0.2, hidden_sizes=(128, 64)) -> Tuple[Dict, Dict]:
    del dropout_rate  # dropout is a forward-time argument, not a parameter
    h1, h2 = hidden_sizes
    ks = jax.random.split(key, 6)
    params = {
        "lstm1": lstm_init(ks[0], 1, h1),
        "lstm2": lstm_init(ks[1], h1, h2),
        "lstm3": lstm_init(ks[2], h2, h2),
        "attn": linear_init(ks[3], h2, 1),
        "fc1": linear_init(ks[4], h2, 32),
        "fc2": linear_init(ks[5], 32, 1),
        "bn_gamma": jnp.ones((h2,)),
        "bn_beta": jnp.zeros((h2,)),
    }
    state = {"bn_mean": jnp.zeros((h2,)), "bn_var": jnp.ones((h2,))}
    return params, state


def forward(
    params: Dict, state: Dict, x: jnp.ndarray, *, train: bool = False, rng=None, rate: float = 0.2,
    remat_chunk: int | None = None,
) -> Tuple[jnp.ndarray, Dict]:
    """``remat_chunk``: rematerialise the LSTM scans in chunks of that many
    time steps (identical math/gradients, ~T/chunk less HBM for backward
    residuals — see ``layers.lstm_apply_remat``); None = plain scans."""
    apply = lstm_apply if remat_chunk is None else (
        lambda p, h: lstm_apply_remat(p, h, remat_chunk)
    )
    k1 = k2 = None
    if train:
        k1, k2 = jax.random.split(rng)
    h, _ = apply(params["lstm1"], x)
    h = dropout(k1, h, rate, train)
    h, _ = apply(params["lstm2"], h)
    h = dropout(k2, h, rate, train)
    h, _ = apply(params["lstm3"], h)  # (B, T, H)

    attn = jax.nn.softmax(linear_apply(params["attn"], h), axis=1)  # (B, T, 1)
    pooled = jnp.sum(h * attn, axis=1)  # (B, H)

    if train:
        mu = jnp.mean(pooled, axis=0)
        var = jnp.var(pooled, axis=0)
        n = pooled.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "bn_mean": (1 - _BN_MOMENTUM) * state["bn_mean"] + _BN_MOMENTUM * mu,
            "bn_var": (1 - _BN_MOMENTUM) * state["bn_var"] + _BN_MOMENTUM * unbiased,
        }
    else:
        mu, var = state["bn_mean"], state["bn_var"]
        new_state = state
    normed = (pooled - mu) / jnp.sqrt(var + _BN_EPS)
    normed = normed * params["bn_gamma"] + params["bn_beta"]

    h = jax.nn.relu(linear_apply(params["fc1"], normed))
    logits = linear_apply(params["fc2"], h)
    return jax.nn.sigmoid(logits), new_state
