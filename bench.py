"""Headline benchmark: flagship LSTM-autoencoder training throughput.

Measures fused train-step throughput (forward + backward + Adam update,
batch 128 x 320 x 1, the reference's training configuration) on the
available accelerator, against a live torch-CPU implementation of the same
architecture — the reference's own compute stack (torch, CPU fallback) on
this machine.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH, SEQ, LATENT = 128, 320, 10


def bench_tpu(n_steps: int = 30) -> float:
    import jax
    import jax.numpy as jnp

    from ae_waveforms_tpu.models import lstm_ae
    from ae_waveforms_tpu.train.optimizers import make_optimizer

    params = lstm_ae.init(jax.random.PRNGKey(0), LATENT)
    optimizer = make_optimizer("adam", 1e-3)
    opt_state = optimizer.init(params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((BATCH, SEQ, 1)), jnp.float32)

    @jax.jit
    def step(params, opt_state, x, key):
        def loss_fn(p):
            pred = lstm_ae.forward(p, x, train=True, rng=key)
            return jnp.mean((pred - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, x, key)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, x, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return n_steps * BATCH / dt


def bench_torch_cpu(n_steps: int = 3) -> float:
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(torch.get_num_threads(), 1))

    class AE(nn.Module):
        def __init__(self):
            super().__init__()
            self.e1 = nn.LSTM(1, 128, batch_first=True)
            self.e2 = nn.LSTM(128, 64, batch_first=True)
            self.e3 = nn.LSTM(64, LATENT, batch_first=True)
            self.d1 = nn.LSTM(LATENT, 64, batch_first=True)
            self.d2 = nn.LSTM(64, 128, batch_first=True)
            self.d3 = nn.LSTM(128, 1, batch_first=True)
            self.lin = nn.Linear(1, 1)
            self.drop = nn.Dropout(0.2)

        def forward(self, x):
            h, _ = self.e1(x)
            h = self.drop(h)
            h, _ = self.e2(h)
            h = self.drop(h)
            _, (hn, _) = self.e3(h)
            z = hn[-1]
            rep = z.unsqueeze(1).repeat(1, x.size(1), 1)
            h, _ = self.d1(rep)
            h = self.drop(h)
            h, _ = self.d2(h)
            h = self.drop(h)
            h, _ = self.d3(h)
            return self.lin(h)

    model = AE().train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    crit = nn.MSELoss()
    x = torch.randn(BATCH, SEQ, 1)
    # warmup
    opt.zero_grad()
    crit(model(x), x).backward()
    opt.step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        opt.zero_grad()
        loss = crit(model(x), x)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return n_steps * BATCH / dt


def _bench_tpu_resilient() -> float:
    """The tunnelled TPU worker occasionally crashes mid-session
    (UNAVAILABLE), which poisons the in-process JAX client — recovery needs
    a fresh process.  Try in-process first, then up to two subprocess
    retries with backoff."""
    import subprocess
    import sys

    try:
        return bench_tpu()
    except Exception as e:
        print(f"# in-process TPU bench failed ({type(e).__name__}); retrying in subprocess", file=sys.stderr)
    for attempt in range(2):
        time.sleep(60 * (attempt + 1))
        proc = subprocess.run(
            [sys.executable, __file__, "--tpu-only"], capture_output=True, text=True
        )
        for line in proc.stdout.splitlines():
            try:
                return float(line.strip())
            except ValueError:
                continue
    raise RuntimeError("TPU benchmark failed after retries")


def main():
    from ae_waveforms_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    tpu = _bench_tpu_resilient()
    ref = bench_torch_cpu()
    print(
        json.dumps(
            {
                "metric": "lstm_ae_train_throughput",
                "value": round(tpu, 1),
                "unit": "samples/s",
                "vs_baseline": round(tpu / ref, 2),
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--tpu-only" in sys.argv:
        from ae_waveforms_tpu.core.runtime import enable_compilation_cache

        enable_compilation_cache()
        print(bench_tpu())
    else:
        main()
