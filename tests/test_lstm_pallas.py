"""Fused pallas LSTM encoder vs the XLA-scan reference (interpret mode on
CPU; compiled on TPU by the bench)."""

import numpy as np
import jax
import jax.numpy as jnp

from ae_waveforms_tpu.models import lstm_ae
from ae_waveforms_tpu.ops.lstm_pallas import encode_fused


def test_fused_encoder_matches_scan():
    params = lstm_ae.init(jax.random.PRNGKey(0), latent_size=10)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 64, 1)), jnp.float32)
    ref = lstm_ae.latent_of(params, x)
    got = encode_fused(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_encoder_other_sizes():
    params = lstm_ae.init(jax.random.PRNGKey(1), latent_size=20)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 96, 1)), jnp.float32)
    ref = lstm_ae.latent_of(params, x)
    got = encode_fused(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
