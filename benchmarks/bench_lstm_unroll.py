"""lax.scan unroll sweep on the LSTM-AE train step — measured NEGATIVE
result (real chip, 2026-08-16): unroll=1 9244 samples/s, monotonically
worse to 7267 at unroll=32.  The scan is latency-bound on the serial
recurrent dependency, not on loop overhead; unrolling only grows the
program.  Per-layer hoisted-projection lstm_apply with unroll=1 stays the
production form."""
import sys, pathlib, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
from ae_waveforms_tpu.models import layers as L
from ae_waveforms_tpu.models import lstm_ae
from ae_waveforms_tpu.train.optimizers import make_optimizer

BATCH, SEQ, LATENT = 128, 320, 10
params = lstm_ae.init(jax.random.PRNGKey(0), LATENT)
optimizer = make_optimizer("adam", 1e-3)
x = jnp.asarray(np.random.default_rng(0).standard_normal((BATCH, SEQ, 1)), jnp.float32)
key = jax.random.PRNGKey(1)

def run(unroll):
    orig = L.lstm_apply
    def lstm_apply_u(params, x):
        B, T, _ = x.shape
        H = params["w_hh"].shape[1]
        gates_x = x @ params["w_ih"].T + (params["b_ih"] + params["b_hh"])
        w_hh_t = params["w_hh"].T
        def step(carry, gx):
            h, c = carry
            gates = gx + h @ w_hh_t
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h
        h0 = jnp.zeros((B, H), x.dtype)
        (h_last, _), hs = jax.lax.scan(step, (h0, h0), jnp.swapaxes(gates_x, 0, 1), unroll=unroll)
        return jnp.swapaxes(hs, 0, 1), h_last
    L.lstm_apply = lstm_apply_u
    import ae_waveforms_tpu.models.lstm_ae as M
    M.lstm_apply = lstm_apply_u
    @jax.jit
    def step(params, opt_state, x, key):
        def loss_fn(p):
            pred = lstm_ae.forward(p, x, train=True, rng=key)
            return jnp.mean((pred - x) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return jax.tree_util.tree_map(lambda a, u: a + u, params, updates), opt_state, loss
    s = optimizer.init(params)
    p, s, loss = step(params, s, x, key); np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(30):
        p, s, loss = step(p, s, x, key)
    np.asarray(loss)
    dt = time.perf_counter() - t0
    print(f"unroll={unroll:3d}  {30*BATCH/dt:8.0f} samples/s  {dt/30*1e3:6.2f} ms/step", flush=True)
    L.lstm_apply = orig; M.lstm_apply = orig

for u in [1, 4, 8, 16, 32]:
    run(u)
