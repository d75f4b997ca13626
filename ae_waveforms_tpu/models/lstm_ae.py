"""Recurrent autoencoder (capability twin of model_classes.py:8-45).

Encoder: LSTM 1->128 -> dropout -> LSTM 128->64 -> dropout -> LSTM
64->latent; the latent code is the final hidden state of the last LSTM.
Decoder: latent repeated across the 320 steps -> LSTM latent->64 -> dropout
-> LSTM 64->128 -> dropout -> LSTM 128->1 -> Linear(1, 1).

Input layout (B, T, 1) ("LSTM layout", swap_dim=False in the reference's
dataset, load_data.py:35-46).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ae_waveforms_tpu.models.layers import dropout, linear_apply, linear_init, lstm_apply, lstm_init

__all__ = ["init", "encode", "decode", "forward", "latent_of"]


def init(key, latent_size: int, dropout_rate: float = 0.2, hidden_sizes=(128, 64)) -> Dict:
    del dropout_rate  # dropout is a forward-time argument, not a parameter
    ks = jax.random.split(key, 7)
    h1, h2 = hidden_sizes
    return {
        "enc1": lstm_init(ks[0], 1, h1),
        "enc2": lstm_init(ks[1], h1, h2),
        "enc3": lstm_init(ks[2], h2, latent_size),
        "dec1": lstm_init(ks[3], latent_size, h2),
        "dec2": lstm_init(ks[4], h2, h1),
        "dec3": lstm_init(ks[5], h1, 1),
        "out": linear_init(ks[6], 1, 1),
    }


def encode(params: Dict, x: jnp.ndarray, *, train: bool = False, rng=None, rate: float = 0.2) -> jnp.ndarray:
    k1 = k2 = None
    if train:
        k1, k2 = jax.random.split(rng)
    h, _ = lstm_apply(params["enc1"], x)
    h = dropout(k1, h, rate, train)
    h, _ = lstm_apply(params["enc2"], h)
    h = dropout(k2, h, rate, train)
    _, z = lstm_apply(params["enc3"], h)
    return z  # (B, latent)


def decode(params: Dict, z: jnp.ndarray, seq_len: int, *, train: bool = False, rng=None, rate: float = 0.2) -> jnp.ndarray:
    k1 = k2 = None
    if train:
        k1, k2 = jax.random.split(rng)
    rep = jnp.repeat(z[:, None, :], seq_len, axis=1)
    h, _ = lstm_apply(params["dec1"], rep)
    h = dropout(k1, h, rate, train)
    h, _ = lstm_apply(params["dec2"], h)
    h = dropout(k2, h, rate, train)
    h, _ = lstm_apply(params["dec3"], h)
    return linear_apply(params["out"], h)


def forward(params: Dict, x: jnp.ndarray, *, train: bool = False, rng=None, rate: float = 0.2) -> jnp.ndarray:
    ke = kd = None
    if train:
        ke, kd = jax.random.split(rng)
    z = encode(params, x, train=train, rng=ke, rate=rate)
    return decode(params, z, x.shape[1], train=train, rng=kd, rate=rate)


def latent_of(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return encode(params, x, train=False)
