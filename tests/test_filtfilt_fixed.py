"""Fixed-shape (bucketed) filtfilt vs scipy across lengths in one bucket."""

import numpy as np
import jax.numpy as jnp
import scipy.signal

from ae_waveforms_tpu.signals.filters import butter_coefficients, filtfilt_fixed


def test_fixed_shape_matches_scipy_multiple_lengths():
    rng = np.random.default_rng(0)
    N = 4096
    b, a, _ = butter_coefficients(4, 1.0, "high", 500.0)
    for n in (300, 1000, 2500, 4096):
        x = rng.standard_normal(n)
        buf = np.zeros(N, np.float32)
        buf[:n] = x
        got = np.asarray(filtfilt_fixed(jnp.asarray(buf), n, 4, 1.0, "high", 500.0))[:n]
        ref = scipy.signal.filtfilt(b, a, x)
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_butterworth_f32_bucketed_path():
    from ae_waveforms_tpu.signals.filters import butterworth

    rng = np.random.default_rng(1)
    x = rng.standard_normal(3000)
    x[1200:1300] = np.nan  # two segments of different lengths, one bucket
    out = butterworth(x, "low", 30.0, 500, 4, precision="float32")
    b, a, _ = butter_coefficients(4, 30.0, "low", 500.0)
    np.testing.assert_allclose(out[:1200], scipy.signal.filtfilt(b, a, x[:1200]), atol=1e-5)
    np.testing.assert_allclose(out[1300:], scipy.signal.filtfilt(b, a, x[1300:]), atol=1e-5)
