"""Numerical parity of the pure-JAX models against torch oracles.

The oracles are small torch modules assembled here from the architecture
spec; JAX parameters are copied into them and eval-mode outputs compared.
This pins gate ordering, bias duplication, transpose-conv geometry and the
half-pixel linear upsample — the places where a re-implementation could
silently diverge.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from ae_waveforms_tpu.models import conv_ae, lstm_ae, lstm_classifier

torch.manual_seed(0)


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32)


def _copy_lstm(t_lstm: tnn.LSTM, p):
    t_lstm.weight_ih_l0.data = _t(p["w_ih"])
    t_lstm.weight_hh_l0.data = _t(p["w_hh"])
    t_lstm.bias_ih_l0.data = _t(p["b_ih"])
    t_lstm.bias_hh_l0.data = _t(p["b_hh"])


def test_lstm_layer_matches_torch():
    key = jax.random.PRNGKey(1)
    from ae_waveforms_tpu.models.layers import lstm_apply, lstm_init

    p = lstm_init(key, 3, 7)
    x = np.random.default_rng(0).standard_normal((4, 11, 3)).astype(np.float32)
    out, h_last = lstm_apply(p, jnp.asarray(x))

    ref = tnn.LSTM(input_size=3, hidden_size=7, batch_first=True)
    _copy_lstm(ref, p)
    with torch.no_grad():
        t_out, (t_h, _) = ref(_t(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), t_h[0].numpy(), atol=1e-5)


def test_lstm_ae_forward_matches_torch():
    key = jax.random.PRNGKey(2)
    params = lstm_ae.init(key, latent_size=10)
    x = np.random.default_rng(1).standard_normal((3, 320, 1)).astype(np.float32)

    class Oracle(tnn.Module):
        def __init__(self):
            super().__init__()
            self.e1 = tnn.LSTM(1, 128, batch_first=True)
            self.e2 = tnn.LSTM(128, 64, batch_first=True)
            self.e3 = tnn.LSTM(64, 10, batch_first=True)
            self.d1 = tnn.LSTM(10, 64, batch_first=True)
            self.d2 = tnn.LSTM(64, 128, batch_first=True)
            self.d3 = tnn.LSTM(128, 1, batch_first=True)
            self.lin = tnn.Linear(1, 1)

        def forward(self, x):
            h, _ = self.e1(x)
            h, _ = self.e2(h)
            h, (hn, _) = self.e3(h)
            z = hn[-1]
            rep = z.unsqueeze(1).repeat(1, x.size(1), 1)
            h, _ = self.d1(rep)
            h, _ = self.d2(h)
            h, _ = self.d3(h)
            return self.lin(h), z

    ref = Oracle()
    for t_lstm, name in [
        (ref.e1, "enc1"), (ref.e2, "enc2"), (ref.e3, "enc3"),
        (ref.d1, "dec1"), (ref.d2, "dec2"), (ref.d3, "dec3"),
    ]:
        _copy_lstm(t_lstm, params[name])
    ref.lin.weight.data = _t(params["out"]["w"])
    ref.lin.bias.data = _t(params["out"]["b"])

    out = lstm_ae.forward(params, jnp.asarray(x))
    z = lstm_ae.latent_of(params, jnp.asarray(x))
    with torch.no_grad():
        t_out, t_z = ref(_t(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(z), t_z.numpy(), atol=2e-5)


def test_conv_ae_forward_matches_torch():
    key = jax.random.PRNGKey(3)
    params = conv_ae.init(key, latent_size=10)
    x = np.random.default_rng(2).standard_normal((3, 1, 320)).astype(np.float32)

    class Oracle(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Conv1d(1, 16, 3, stride=2, padding=1)
            self.c2 = tnn.Conv1d(16, 32, 3, stride=2, padding=1)
            self.c3 = tnn.Conv1d(32, 64, 3, stride=2, padding=1)
            self.c4 = tnn.Conv1d(64, 128, 3, stride=2, padding=1)
            self.cl = tnn.Conv1d(128, 10, 1)
            self.pool = tnn.AvgPool1d(2, stride=2)
            self.dl = tnn.ConvTranspose1d(10, 128, 1)
            self.u1 = tnn.Upsample(size=3, mode="linear")
            self.t1 = tnn.ConvTranspose1d(128, 64, 3, stride=2, padding=1, output_padding=1)
            self.u2 = tnn.Upsample(size=10, mode="linear")
            self.t2 = tnn.ConvTranspose1d(64, 32, 3, stride=2, padding=1, output_padding=1)
            self.u3 = tnn.Upsample(size=40, mode="linear")
            self.t3 = tnn.ConvTranspose1d(32, 16, 3, stride=2, padding=1, output_padding=1)
            self.u4 = tnn.Upsample(size=160, mode="linear")
            self.t4 = tnn.ConvTranspose1d(16, 1, 3, stride=2, padding=1, output_padding=1)

        def forward(self, x):
            r = torch.relu
            h = self.pool(r(self.c1(x)))
            h = self.pool(r(self.c2(h)))
            h = self.pool(r(self.c3(h)))
            h = self.pool(r(self.c4(h)))
            z = self.cl(h)
            h = self.u1(r(self.dl(z)))
            h = self.u2(r(self.t1(h)))
            h = self.u3(r(self.t2(h)))
            h = self.u4(r(self.t3(h)))
            return self.t4(h), z

    ref = Oracle()
    pairs = [
        (ref.c1, "e1"), (ref.c2, "e2"), (ref.c3, "e3"), (ref.c4, "e4"), (ref.cl, "e_lat"),
        (ref.dl, "d_lat"), (ref.t1, "d1"), (ref.t2, "d2"), (ref.t3, "d3"), (ref.t4, "d4"),
    ]
    for mod, name in pairs:
        mod.weight.data = _t(params[name]["w"])
        mod.bias.data = _t(params[name]["b"])

    out = conv_ae.forward(params, jnp.asarray(x))
    z = conv_ae.latent_of(params, jnp.asarray(x))
    with torch.no_grad():
        t_out, t_z = ref(_t(x))
    assert out.shape == (3, 1, 320)
    np.testing.assert_allclose(np.asarray(z), t_z.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)


def test_lstm_classifier_matches_torch():
    key = jax.random.PRNGKey(4)
    params, state = lstm_classifier.init(key)
    x = np.random.default_rng(3).standard_normal((5, 60, 1)).astype(np.float32)

    class Oracle(tnn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = tnn.LSTM(1, 128, batch_first=True)
            self.l2 = tnn.LSTM(128, 64, batch_first=True)
            self.l3 = tnn.LSTM(64, 64, batch_first=True)
            self.attn = tnn.Linear(64, 1)
            self.bn = tnn.BatchNorm1d(64)
            self.f1 = tnn.Linear(64, 32)
            self.f2 = tnn.Linear(32, 1)

        def forward(self, x):
            h, _ = self.l1(x)
            h, _ = self.l2(h)
            h, _ = self.l3(h)
            w = torch.softmax(self.attn(h), dim=1)
            p = torch.sum(h * w, dim=1)
            p = self.bn(p)
            p = torch.relu(self.f1(p))
            return torch.sigmoid(self.f2(p))

    ref = Oracle().eval()
    for mod, name in [(ref.l1, "lstm1"), (ref.l2, "lstm2"), (ref.l3, "lstm3")]:
        _copy_lstm(mod, params[name])
    for mod, name in [(ref.attn, "attn"), (ref.f1, "fc1"), (ref.f2, "fc2")]:
        mod.weight.data = _t(params[name]["w"])
        mod.bias.data = _t(params[name]["b"])
    ref.bn.weight.data = _t(params["bn_gamma"])
    ref.bn.bias.data = _t(params["bn_beta"])
    ref.bn.running_mean.data = _t(state["bn_mean"])
    ref.bn.running_var.data = _t(state["bn_var"])

    probs, _ = lstm_classifier.forward(params, state, jnp.asarray(x))
    with torch.no_grad():
        t_probs = ref(_t(x))
    np.testing.assert_allclose(np.asarray(probs), t_probs.numpy(), atol=1e-5)
