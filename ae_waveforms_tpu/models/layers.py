"""Primitive layers with PyTorch-compatible semantics and initialisation.

These are pure functions over explicit parameter pytrees — no framework
module system — so the train step is a single jit-compiled function and
parameters shard trivially under pjit.

LSTM: gate order (i, f, g, o), both b_ih and b_hh biases, h = o * tanh(c),
uniform(-1/sqrt(H), 1/sqrt(H)) init — the semantics of torch.nn.LSTM that the
reference models rely on (model_classes.py:8-45).  The input projection for
the whole sequence is hoisted out of the scan into one large (B*T, in) @
(in, 4H) matmul for the MXU; the scan carries only the (B, H) @ (H, 4H)
recurrent matmul.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "lstm_init",
    "lstm_apply",
    "lstm_apply_remat",
    "linear_init",
    "linear_apply",
    "conv1d_init",
    "conv1d_apply",
    "conv1d_transpose_apply",
    "avg_pool1d",
    "upsample_linear",
    "dropout",
]

Params = Dict[str, jnp.ndarray]


# ------------------------------- LSTM ---------------------------------------


def lstm_init(key, input_size: int, hidden_size: int, dtype=jnp.float32) -> Params:
    k = 1.0 / math.sqrt(hidden_size)
    ks = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return {
        "w_ih": u(ks[0], (4 * hidden_size, input_size)),
        "w_hh": u(ks[1], (4 * hidden_size, hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def lstm_cell(gates_x, h, c, w_hh_t):
    """One LSTM time step from a pre-projected input (``gates_x`` already
    holds x @ w_ih.T + biases).  torch gate order (i, f, g, o).  Every LSTM
    variant in this module calls this one helper, so a change to the gate
    semantics (dtype, precision, activation) lands in exactly one place."""
    gates = gates_x + h @ w_hh_t
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    return o * jnp.tanh(c), c


def lstm_apply(params: Params, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, T, in) -> (outputs (B, T, H), last hidden (B, H)).

    Zero initial (h, c), matching torch defaults.
    """
    B, T, _ = x.shape
    H = params["w_hh"].shape[1]
    # hoisted input projection: one MXU matmul for the whole sequence
    gates_x = x @ params["w_ih"].T + (params["b_ih"] + params["b_hh"])  # (B, T, 4H)
    w_hh_t = params["w_hh"].T

    def step(carry, gx):
        h, c = lstm_cell(gx, *carry, w_hh_t)
        return (h, c), h

    h0 = jnp.zeros((B, H), x.dtype)
    (h_last, _), hs = jax.lax.scan(step, (h0, h0), jnp.swapaxes(gates_x, 0, 1))
    return jnp.swapaxes(hs, 0, 1), h_last


def lstm_apply_remat(params: Params, x: jnp.ndarray, chunk: int = 20) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``lstm_apply`` with chunked rematerialisation: the time axis splits
    into ``chunk``-step segments, each wrapped in ``jax.checkpoint`` with its
    OWN per-chunk input projection, so the backward pass stores only the
    (B, 2H) carries at chunk boundaries plus one chunk's residuals instead
    of the full (B, T, ~8H) activation trail — an O(T/chunk) HBM cut for
    one extra forward recompute during backward.

    This is what lets the DL-classifier harness vmap ALL 25 seeds of the
    reference's sweep (main_dl_classify.py:122-158) into one device program:
    the plain path's backward residuals are ~53 GB at 25 seeds x batch 512
    x 320 steps (>15.75 GB HBM), the chunked form fits with room to spare.
    Identical math and gradients to ``lstm_apply`` (tests/test_dl_multi.py).
    """
    B, T, _ = x.shape
    H = params["w_hh"].shape[1]
    pad = (-T) % chunk
    if pad:  # pad the tail; padded outputs are sliced off below
        x = jnp.concatenate([x, jnp.zeros((B, pad, x.shape[2]), x.dtype)], axis=1)
    n_chunks = (T + pad) // chunk
    xs = jnp.swapaxes(x.reshape(B, n_chunks, chunk, x.shape[2]), 0, 1)
    w_ih_t = params["w_ih"].T
    w_hh_t = params["w_hh"].T
    b = params["b_ih"] + params["b_hh"]

    @jax.checkpoint
    def chunk_fn(carry, xc):  # xc: (B, chunk, in)
        gates_x = xc @ w_ih_t + b  # per-chunk hoisted projection (MXU)

        def step(c2, gx):
            h, c = lstm_cell(gx, *c2, w_hh_t)
            return (h, c), h

        carry, hs = jax.lax.scan(step, carry, jnp.swapaxes(gates_x, 0, 1))
        return carry, jnp.swapaxes(hs, 0, 1)

    h0 = jnp.zeros((B, H), x.dtype)
    _, hs = jax.lax.scan(chunk_fn, (h0, h0), xs)
    out = jnp.swapaxes(hs, 0, 1).reshape(B, T + pad, H)
    # h_last from the last REAL step (the scan ran through any pad steps)
    return out[:, :T], out[:, T - 1]


def lstm_stack_apply(
    layer_params,
    x: jnp.ndarray,
    dropout_masks=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """A whole stack of LSTM layers in ONE ``lax.scan`` over time.

    A stacked RNN consumes layer i-1's output at the SAME time step, so all
    cells can advance together in one scan — identical math, 1/N the scan
    iterations of per-layer scans.

    MEASURED NEGATIVE RESULT on TPU (benchmarks/bench_lstm_stack.py, the
    reference train config 128x320, fwd+bwd+Adam): 18.0 ms/step fused vs
    13.7 ms/step for per-layer ``lstm_apply`` scans.  The per-layer form
    hoists EVERY layer's input projection out of the scan into one large
    (B*T, in) @ (in, 4H) MXU matmul; this fused form can only hoist layer
    0's (later layers' inputs materialise step-by-step), so layers 1+ pay
    an extra small matmul inside the scan body — which costs more than the
    saved scan-iteration overhead.  Kept for documentation and for any
    future config where inter-layer dropout masks must be resampled per
    step; the model files use per-layer ``lstm_apply``.

    ``dropout_masks``: optional list (len = n_layers - 1) of (B, T, H_i)
    multiplicative masks applied to layer i's output before it feeds layer
    i+1 (the reference drops between stacked layers, model_classes.py:26-30).
    Returns (top-layer outputs (B, T, H_top), top-layer last hidden (B, H)).
    """
    B, T, _ = x.shape
    n = len(layer_params)
    # layer 0's input projection hoisted onto one big MXU matmul
    p0 = layer_params[0]
    gates_x1 = x @ p0["w_ih"].T + (p0["b_ih"] + p0["b_hh"])
    w_hh_t = [p["w_hh"].T for p in layer_params]
    w_ih_t = [p["w_ih"].T for p in layer_params[1:]]
    bias = [p["b_ih"] + p["b_hh"] for p in layer_params[1:]]
    Hs = [p["w_hh"].shape[1] for p in layer_params]

    def step(carry, inp):
        gx1 = inp[0]
        masks_t = inp[1:]
        new_carry = []
        feed = None
        for li in range(n):
            h, c = carry[li]
            if li == 0:
                gates = gx1
            else:
                gates = feed @ w_ih_t[li - 1] + bias[li - 1]
            h, c = lstm_cell(gates, h, c, w_hh_t[li])
            new_carry.append((h, c))
            feed = h
            if li < n - 1 and dropout_masks is not None:
                feed = feed * masks_t[li]
        return tuple(new_carry), feed  # feed == top-layer h

    carry0 = tuple(
        (jnp.zeros((B, Hs[i]), x.dtype), jnp.zeros((B, Hs[i]), x.dtype)) for i in range(n)
    )
    xs = (jnp.swapaxes(gates_x1, 0, 1),)
    if dropout_masks is not None:
        xs = xs + tuple(jnp.swapaxes(m, 0, 1) for m in dropout_masks)
    carry, hs = jax.lax.scan(step, carry0, xs)
    return jnp.swapaxes(hs, 0, 1), carry[n - 1][0]


# ------------------------------ Linear --------------------------------------


def linear_init(key, in_features: int, out_features: int, dtype=jnp.float32) -> Params:
    k = 1.0 / math.sqrt(in_features)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (out_features, in_features), dtype, -k, k),
        "b": jax.random.uniform(k2, (out_features,), dtype, -k, k),
    }


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"].T + params["b"]


# ------------------------------- Conv ---------------------------------------


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32, transpose: bool = False) -> Params:
    # torch kaiming_uniform(a=sqrt(5)) reduces to uniform(-1/sqrt(fan_in), ..)
    # with fan_in = in_ch * kernel; ConvTranspose1d fans on its in_channels too.
    fan_in = in_ch * kernel
    k = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    shape = (in_ch, out_ch, kernel) if transpose else (out_ch, in_ch, kernel)
    return {
        "w": jax.random.uniform(k1, shape, dtype, -k, k),
        "b": jax.random.uniform(k2, (out_ch,), dtype, -k, k),
    }


def conv1d_apply(params: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """x: (B, C, L) NCW; weight (out, in, K) — torch Conv1d layout."""
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + params["b"][None, :, None]


def conv1d_transpose_apply(
    params: Params, x: jnp.ndarray, stride: int = 2, padding: int = 1, output_padding: int = 1
) -> jnp.ndarray:
    """torch ConvTranspose1d semantics: L_out = (L-1)*s - 2p + K + op.

    Implemented as an input-dilated convolution with the spatially flipped
    kernel — the standard transpose-as-fractionally-strided-conv identity.
    weight layout (in, out, K) as in torch.
    """
    w = params["w"]  # (in, out, K)
    K = w.shape[-1]
    w_flip = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, K)
    pad_lo = K - 1 - padding
    pad_hi = K - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + params["b"][None, :, None]


def avg_pool1d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """torch AvgPool1d (no padding, floor division of length)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, window), (1, 1, stride), "VALID"
    ) / float(window)


def upsample_linear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """torch nn.Upsample(size, mode='linear', align_corners=False):
    half-pixel-centred linear resize along the last axis of (B, C, L)."""
    B, C, L = x.shape
    return jax.image.resize(x, (B, C, size), method="linear")


def dropout(key, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
