"""Training-dynamics parity: with identical initial weights, identical
batches, no dropout and plain Adam, the JAX conv-AE training trajectory must
track a torch oracle step for step."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from ae_waveforms_tpu.models import conv_ae


def _torch_model(params):
    class Oracle(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Conv1d(1, 16, 3, stride=2, padding=1)
            self.c2 = tnn.Conv1d(16, 32, 3, stride=2, padding=1)
            self.c3 = tnn.Conv1d(32, 64, 3, stride=2, padding=1)
            self.c4 = tnn.Conv1d(64, 128, 3, stride=2, padding=1)
            self.cl = tnn.Conv1d(128, 4, 1)
            self.pool = tnn.AvgPool1d(2, stride=2)
            self.dl = tnn.ConvTranspose1d(4, 128, 1)
            self.t1 = tnn.ConvTranspose1d(128, 64, 3, stride=2, padding=1, output_padding=1)
            self.t2 = tnn.ConvTranspose1d(64, 32, 3, stride=2, padding=1, output_padding=1)
            self.t3 = tnn.ConvTranspose1d(32, 16, 3, stride=2, padding=1, output_padding=1)
            self.t4 = tnn.ConvTranspose1d(16, 1, 3, stride=2, padding=1, output_padding=1)
            self.u = {s: tnn.Upsample(size=s, mode="linear") for s in (3, 10, 40, 160)}

        def forward(self, x):
            r = torch.relu
            h = self.pool(r(self.c1(x)))
            h = self.pool(r(self.c2(h)))
            h = self.pool(r(self.c3(h)))
            h = self.pool(r(self.c4(h)))
            z = self.cl(h)
            h = self.u[3](r(self.dl(z)))
            h = self.u[10](r(self.t1(h)))
            h = self.u[40](r(self.t2(h)))
            h = self.u[160](r(self.t3(h)))
            return self.t4(h)

    m = Oracle()
    for mod, name in [
        (m.c1, "e1"), (m.c2, "e2"), (m.c3, "e3"), (m.c4, "e4"), (m.cl, "e_lat"),
        (m.dl, "d_lat"), (m.t1, "d1"), (m.t2, "d2"), (m.t3, "d3"), (m.t4, "d4"),
    ]:
        mod.weight.data = torch.tensor(np.asarray(params[name]["w"]))
        mod.bias.data = torch.tensor(np.asarray(params[name]["b"]))
    return m


def test_adam_training_trajectory_matches_torch():
    params = conv_ae.init(jax.random.PRNGKey(0), 4)
    rng = np.random.default_rng(0)
    batches = rng.standard_normal((12, 16, 1, 320)).astype(np.float32)

    # --- torch side -----------------------------------------------------
    tm = _torch_model(params).train()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    crit = tnn.MSELoss()
    torch_losses = []
    for b in batches:
        x = torch.tensor(b)
        opt.zero_grad()
        loss = crit(tm(x), x)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # --- jax side -------------------------------------------------------
    from ae_waveforms_tpu.train.optimizers import make_optimizer

    optax_opt = make_optimizer("adam", 1e-3)
    opt_state = optax_opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            pred = conv_ae.forward(p, x, train=False)  # no dropout
            return jnp.mean((pred - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optax_opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    jax_losses = []
    p = params
    for b in batches:
        p, opt_state, loss = step(p, opt_state, jnp.asarray(b))
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-5)
    assert jax_losses[-1] < jax_losses[0]  # both actually train


def test_lstm_ae_adam_trajectory_matches_torch():
    """Same check for the flagship recurrent model (short sequences keep the
    torch-CPU side fast)."""
    from ae_waveforms_tpu.models import lstm_ae

    params = lstm_ae.init(jax.random.PRNGKey(1), latent_size=4)
    rng = np.random.default_rng(1)
    batches = rng.standard_normal((8, 8, 48, 1)).astype(np.float32)

    class Oracle(tnn.Module):
        def __init__(self):
            super().__init__()
            self.e1 = tnn.LSTM(1, 128, batch_first=True)
            self.e2 = tnn.LSTM(128, 64, batch_first=True)
            self.e3 = tnn.LSTM(64, 4, batch_first=True)
            self.d1 = tnn.LSTM(4, 64, batch_first=True)
            self.d2 = tnn.LSTM(64, 128, batch_first=True)
            self.d3 = tnn.LSTM(128, 1, batch_first=True)
            self.lin = tnn.Linear(1, 1)

        def forward(self, x):
            h, _ = self.e1(x)
            h, _ = self.e2(h)
            _, (hn, _) = self.e3(h)
            rep = hn[-1].unsqueeze(1).repeat(1, x.size(1), 1)
            h, _ = self.d1(rep)
            h, _ = self.d2(h)
            h, _ = self.d3(h)
            return self.lin(h)

    tm = Oracle().train()
    for mod, name in [
        (tm.e1, "enc1"), (tm.e2, "enc2"), (tm.e3, "enc3"),
        (tm.d1, "dec1"), (tm.d2, "dec2"), (tm.d3, "dec3"),
    ]:
        mod.weight_ih_l0.data = torch.tensor(np.asarray(params[name]["w_ih"]))
        mod.weight_hh_l0.data = torch.tensor(np.asarray(params[name]["w_hh"]))
        mod.bias_ih_l0.data = torch.tensor(np.asarray(params[name]["b_ih"]))
        mod.bias_hh_l0.data = torch.tensor(np.asarray(params[name]["b_hh"]))
    tm.lin.weight.data = torch.tensor(np.asarray(params["out"]["w"]))
    tm.lin.bias.data = torch.tensor(np.asarray(params["out"]["b"]))

    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    crit = tnn.MSELoss()
    torch_losses = []
    for b in batches:
        x = torch.tensor(b)
        opt.zero_grad()
        loss = crit(tm(x), x)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    from ae_waveforms_tpu.train.optimizers import make_optimizer

    optax_opt = make_optimizer("adam", 1e-3)
    opt_state = optax_opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            pred = lstm_ae.forward(p, x, train=False)
            return jnp.mean((pred - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optax_opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    jax_losses = []
    p = params
    for b in batches:
        p, opt_state, loss = step(p, opt_state, jnp.asarray(b))
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-4, atol=5e-5)
