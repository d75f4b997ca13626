"""Convolutional autoencoder (capability twin of model_classes.py:51-108).

Encoder: 4 x [stride-2 conv k3 p1 + ReLU + avg-pool 2] taking
(B, 1, 320) -> (B, 128, 1), then a 1x1 conv to (B, latent, 1).
Decoder: 1x1 deconv to 128 channels, then alternating linear upsamples to
sizes 3/10/40/160 and stride-2 deconvs (k3, p1, output_padding 1), ending at
(B, 1, 320).  Dropout after encoder block 2 and decoder block 2, train only.

Input layout (B, 1, T) ("conv layout", swap_dim=True).

Note: the upsample sizes pin every intermediate length, so the final output
is exactly 320 even though a bare deconv cascade would drift (the reference's
inline shape comments are off-by-one; behaviour matches the actual module).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ae_waveforms_tpu.models.layers import (
    avg_pool1d,
    conv1d_apply,
    conv1d_init,
    conv1d_transpose_apply,
    dropout,
    upsample_linear,
)

__all__ = ["init", "encode", "forward", "latent_of"]


def init(key, latent_size: int, dropout_rate: float = 0.2) -> Dict:
    del dropout_rate  # dropout is a forward-time argument, not a parameter
    ks = jax.random.split(key, 10)
    return {
        "e1": conv1d_init(ks[0], 1, 16, 3),
        "e2": conv1d_init(ks[1], 16, 32, 3),
        "e3": conv1d_init(ks[2], 32, 64, 3),
        "e4": conv1d_init(ks[3], 64, 128, 3),
        "e_lat": conv1d_init(ks[4], 128, latent_size, 1),
        "d_lat": conv1d_init(ks[5], latent_size, 128, 1, transpose=True),
        "d1": conv1d_init(ks[6], 128, 64, 3, transpose=True),
        "d2": conv1d_init(ks[7], 64, 32, 3, transpose=True),
        "d3": conv1d_init(ks[8], 32, 16, 3, transpose=True),
        "d4": conv1d_init(ks[9], 16, 1, 3, transpose=True),
    }


def encode(params: Dict, x: jnp.ndarray, *, train: bool = False, rng=None, rate: float = 0.2) -> jnp.ndarray:
    h = jax.nn.relu(conv1d_apply(params["e1"], x, stride=2, padding=1))  # (B,16,160)
    h = avg_pool1d(h)  # (B,16,80)
    h = jax.nn.relu(conv1d_apply(params["e2"], h, stride=2, padding=1))  # (B,32,40)
    if train:
        h = dropout(rng, h, rate, True)
    h = avg_pool1d(h)  # (B,32,20)
    h = jax.nn.relu(conv1d_apply(params["e3"], h, stride=2, padding=1))  # (B,64,10)
    h = avg_pool1d(h)  # (B,64,5)
    h = jax.nn.relu(conv1d_apply(params["e4"], h, stride=2, padding=1))  # (B,128,3)
    h = avg_pool1d(h)  # (B,128,1)
    return conv1d_apply(params["e_lat"], h)  # (B,latent,1)


def forward(params: Dict, x: jnp.ndarray, *, train: bool = False, rng=None, rate: float = 0.2) -> jnp.ndarray:
    ke = kd = None
    if train:
        ke, kd = jax.random.split(rng)
    z = encode(params, x, train=train, rng=ke, rate=rate)
    h = jax.nn.relu(conv1d_transpose_apply(params["d_lat"], z, stride=1, padding=0, output_padding=0))
    h = upsample_linear(h, 3)
    h = jax.nn.relu(conv1d_transpose_apply(params["d1"], h))  # (B,64,6)->pinned next
    h = upsample_linear(h, 10)
    h = jax.nn.relu(conv1d_transpose_apply(params["d2"], h))
    if train:
        h = dropout(kd, h, rate, True)
    h = upsample_linear(h, 40)
    h = jax.nn.relu(conv1d_transpose_apply(params["d3"], h))
    h = upsample_linear(h, 160)
    return conv1d_transpose_apply(params["d4"], h)  # (B,1,320)


def latent_of(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return encode(params, x, train=False)
