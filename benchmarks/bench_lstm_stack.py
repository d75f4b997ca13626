"""Per-layer lstm_apply scans vs the one-scan fused stack (lstm_stack_apply).

Measured on the real chip (reference train config, batch 128 x 320 x 1,
fwd + bwd + Adam, 2026-08-16):

    seq   9341 samples/s  13.70 ms/step
    fused 7094 samples/s  18.04 ms/step
    seq   9365 samples/s  13.67 ms/step
    fused 7119 samples/s  17.98 ms/step

The per-layer form wins because it hoists EVERY layer's input projection
out of the scan into one large MXU matmul over the whole sequence; the
fused stack can only hoist layer 0's, so layers 1+ pay an extra small
matmul inside the scan body.  See layers.py:lstm_stack_apply docstring;
the model files therefore keep per-layer lstm_apply.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from ae_waveforms_tpu.core.runtime import enable_compilation_cache
from ae_waveforms_tpu.models import lstm_ae
from ae_waveforms_tpu.models.layers import (
    dropout,
    linear_apply,
    lstm_apply,
    lstm_stack_apply,
)
from ae_waveforms_tpu.train.optimizers import make_optimizer

enable_compilation_cache()

BATCH, SEQ, LATENT = 128, 320, 10


def fwd_seq(p, x, rng):
    k1, k2 = jax.random.split(rng)
    h, _ = lstm_apply(p["enc1"], x)
    h = dropout(k1, h, 0.2, True)
    h, _ = lstm_apply(p["enc2"], h)
    h = dropout(k2, h, 0.2, True)
    _, z = lstm_apply(p["enc3"], h)
    k1, k2 = jax.random.split(rng)
    rep = jnp.repeat(z[:, None, :], x.shape[1], axis=1)
    h, _ = lstm_apply(p["dec1"], rep)
    h = dropout(k1, h, 0.2, True)
    h, _ = lstm_apply(p["dec2"], h)
    h = dropout(k2, h, 0.2, True)
    h, _ = lstm_apply(p["dec3"], h)
    return linear_apply(p["out"], h)


def _masks(keys, x, layers):
    B, T = x.shape[0], x.shape[1]
    return [
        dropout(k, jnp.ones((B, T, p["w_hh"].shape[1]), x.dtype), 0.2, True)
        for k, p in zip(keys, layers[:-1])
    ]


def fwd_fused(p, x, rng):
    enc = [p["enc1"], p["enc2"], p["enc3"]]
    dec = [p["dec1"], p["dec2"], p["dec3"]]
    keys = jax.random.split(rng)
    _, z = lstm_stack_apply(enc, x, _masks(keys, x, enc))
    rep = jnp.repeat(z[:, None, :], x.shape[1], axis=1)
    h, _ = lstm_stack_apply(dec, rep, _masks(keys, rep, dec))
    return linear_apply(p["out"], h)


def main():
    params = lstm_ae.init(jax.random.PRNGKey(0), LATENT)
    optimizer = make_optimizer("adam", 1e-3)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, SEQ, 1)), jnp.float32
    )

    def make_step(fwd):
        @jax.jit
        def step(params, opt_state, x, key):
            def loss_fn(p):
                pred = fwd(p, x, key)
                return jnp.mean((pred - x) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
            return params, opt_state, loss

        return step

    key = jax.random.PRNGKey(1)
    for name, fwd in [("seq", fwd_seq), ("fused", fwd_fused)] * 2:
        step = make_step(fwd)
        s = optimizer.init(params)
        p, s, loss = step(params, s, x, key)
        np.asarray(loss)  # transfer = the only reliable sync through the relay
        t0 = time.perf_counter()
        for _ in range(30):
            p, s, loss = step(p, s, x, key)
        np.asarray(loss)
        dt = time.perf_counter() - t0
        print(f"{name:5s} {30 * BATCH / dt:.0f} samples/s  {dt / 30 * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
