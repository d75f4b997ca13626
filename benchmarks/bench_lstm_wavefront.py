"""Diagonal-wavefront LSTM stack vs per-layer scans on the train step.

The shipped AE runs six per-layer ``lstm_apply`` scans: 6 x 320 = 1920
sequential recurrent matmuls forward (and again backward) — the serial
chain, not the MXU, is the measured bottleneck (bench_lstm_unroll.py).
The previously recorded one-scan "fused stack" negative result
(bench_lstm_stack.py) kept all 1920 matmuls serial (layers computed one
after another INSIDE each step) and lost the hoisted input projections,
so it was slower.

The wavefront is different: at scan step s, layer l processes timestep
t = s - l, so all L layers of one stack run CONCURRENTLY as a single
batched matmul per step.  The serial chain shrinks from L*T to T + L - 1
steps per stack (960 -> 322 here, 3x), and every layer's input projection
rides inside the same batched matmul (nothing is lost from the scan
body).  The cost is padding every layer to the max hidden width (128),
which wastes MXU FLOPs on a latency-bound op — the trade this benchmark
measures.

Layout notes: weights are stacked per-gate-padded, W[l] (2*Hmax, 4*Hmax)
holding [w_ih; w_hh] with each torch gate's columns placed at
k*Hmax : k*Hmax + H_l, so one uniform gate split works for every layer.
Padded lanes evolve harmlessly (their outgoing weight rows are zero) and
are sliced off at the stack boundary.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ae_waveforms_tpu.core.runtime import enable_compilation_cache
from ae_waveforms_tpu.models import lstm_ae
from ae_waveforms_tpu.models.layers import dropout, linear_apply, lstm_apply
from ae_waveforms_tpu.train.optimizers import make_optimizer

enable_compilation_cache()

BATCH, SEQ, LATENT = 128, 320, 10
HMAX = 128


def _stack_weights(layer_params, sizes):
    """[(in, hidden)] torch-layout params -> (L, 2*HMAX, 4*HMAX) per-gate-
    padded weight stack + (L, 4*HMAX) bias stack.  Pure jnp (static slices)
    so gradients flow back to the unpadded parameters."""
    L = len(layer_params)
    W = jnp.zeros((L, 2 * HMAX, 4 * HMAX), jnp.float32)
    b = jnp.zeros((L, 4 * HMAX), jnp.float32)
    for l, (p, (I, H)) in enumerate(zip(layer_params, sizes)):
        bb = p["b_ih"] + p["b_hh"]
        for k in range(4):
            W = W.at[l, :I, k * HMAX : k * HMAX + H].set(p["w_ih"][k * H : (k + 1) * H].T)
            W = W.at[l, HMAX : HMAX + H, k * HMAX : k * HMAX + H].set(
                p["w_hh"][k * H : (k + 1) * H].T
            )
            b = b.at[l, k * HMAX : k * HMAX + H].set(bb[k * H : (k + 1) * H])
    return W, b


def wavefront_stack(W, b, x_pad, keep, T):
    """One L-layer wavefront scan.

    W (L, 2*HMAX, 4*HMAX), b (L, 4*HMAX); x_pad (S, B, HMAX) the stack input
    per step (layer 0 consumes x_pad[s]); keep (S, L, B, HMAX) inverted-
    dropout scale factors applied to each layer's OUTPUT as it feeds the
    next layer (last layer's slot unused).  Returns (ys (S, B, HMAX) last
    layer outputs per step, h_final (L, B, HMAX))."""
    L = W.shape[0]
    B = x_pad.shape[1]
    S = x_pad.shape[0]
    l_ids = jnp.arange(L, dtype=jnp.int32)[:, None, None]  # (L,1,1)

    def step(carry, xs):
        h, c, y = carry  # (L,B,HMAX) each; y[l] = dropped output of layer l last step
        x_s, keep_s, s = xs
        # layer inputs: layer 0 <- x_s, layer l <- y[l-1]
        u_in = jnp.concatenate([x_s[None], y[:-1]], axis=0)  # (L,B,HMAX)
        u = jnp.concatenate([u_in, h], axis=-1)  # (L,B,2*HMAX)
        gates = jax.lax.dot_general(
            u, W, (((2,), (1,)), ((0,), (0,)))
        ) + b[:, None, :]  # (L,B,4*HMAX)
        i = jax.nn.sigmoid(gates[..., :HMAX])
        f = jax.nn.sigmoid(gates[..., HMAX : 2 * HMAX])
        g = jnp.tanh(gates[..., 2 * HMAX : 3 * HMAX])
        o = jax.nn.sigmoid(gates[..., 3 * HMAX :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        # warmup mask: layer l is idle until step s == l (t = s - l >= 0),
        # which keeps its state exactly zero at its own t = 0
        live = (s >= l_ids).astype(h_new.dtype)
        h_new = h_new * live
        c_new = c_new * live
        y_new = h_new * keep_s  # inter-layer dropout on the outgoing edge
        return (h_new, c_new, y_new), h_new[L - 1]

    z = jnp.zeros((L, B, HMAX), x_pad.dtype)
    steps = jnp.arange(S, dtype=jnp.int32)
    (h, c, y), ys = jax.lax.scan(step, (z, z, z), (x_pad, keep, steps))
    return ys, h


def _keep_masks(key, S, L, B, T, boundaries, rate, train):
    """(S, L, B, HMAX) inverted-dropout scales; boundary l -> l+1 drops
    layer l's output at timestep t = s - l, i.e. scan row s = t + l."""
    keep = jnp.ones((S, L, B, HMAX), jnp.float32)
    if not train or rate <= 0.0:
        return keep
    for l in boundaries:
        key, kk = jax.random.split(key)
        m = jax.random.bernoulli(kk, 1.0 - rate, (T, B, HMAX)).astype(jnp.float32)
        m = m / (1.0 - rate)
        keep = keep.at[l : l + T, l].set(m)
    return keep


def make_wavefront_forward(sizes_enc, sizes_dec, latent):
    """Returns forward(params, x, rng, train) matching lstm_ae.forward's
    architecture with both stacks run as wavefronts."""

    def forward(params, x, rng, train):
        B, T, _ = x.shape
        L = 3
        S = T + L - 1
        We, be = _stack_weights(
            [params["enc1"], params["enc2"], params["enc3"]], sizes_enc
        )
        Wd, bd = _stack_weights(
            [params["dec1"], params["dec2"], params["dec3"]], sizes_dec
        )
        ke, kd = (jax.random.split(rng) if train else (None, None))

        xe = jnp.zeros((S, B, HMAX), x.dtype)
        xe = xe.at[:T, :, :1].set(jnp.swapaxes(x, 0, 1))
        keep_e = (
            _keep_masks(ke, S, L, B, T, (0, 1), 0.2, train)
            if train
            else jnp.ones((S, L, B, HMAX), x.dtype)
        )
        _, h_enc = wavefront_stack(We, be, xe, keep_e, T)
        zlat = h_enc[2][:, :latent]

        xd = jnp.zeros((S, B, HMAX), x.dtype)
        xd = xd.at[:T, :, :latent].set(
            jnp.broadcast_to(zlat[None], (T, B, latent))
        )
        keep_d = (
            _keep_masks(kd, S, L, B, T, (0, 1), 0.2, train)
            if train
            else jnp.ones((S, L, B, HMAX), x.dtype)
        )
        ys, _ = wavefront_stack(Wd, bd, xd, keep_d, T)
        out = jnp.swapaxes(ys[L - 1 : L - 1 + T, :, :1], 0, 1)  # (B,T,1)
        return linear_apply(params["out"], out)

    return forward


def fwd_seq(p, x, rng, train=True):
    if train:
        ke, kd = jax.random.split(rng)
        k1, k2 = jax.random.split(ke)
    h, _ = lstm_apply(p["enc1"], x)
    if train:
        h = dropout(k1, h, 0.2, True)
    h, _ = lstm_apply(p["enc2"], h)
    if train:
        h = dropout(k2, h, 0.2, True)
    _, z = lstm_apply(p["enc3"], h)
    rep = jnp.repeat(z[:, None, :], x.shape[1], axis=1)
    if train:
        k1, k2 = jax.random.split(kd)
    h, _ = lstm_apply(p["dec1"], rep)
    if train:
        h = dropout(k1, h, 0.2, True)
    h, _ = lstm_apply(p["dec2"], h)
    if train:
        h = dropout(k2, h, 0.2, True)
    h, _ = lstm_apply(p["dec3"], h)
    return linear_apply(p["out"], h)


def time_train(forward, params, tag, n_steps=50, reps=3):
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, SEQ, 1)), jnp.float32
    )

    def loss_fn(p, rng):
        pred = forward(p, x, rng, True)
        return jnp.mean((pred - x) ** 2)

    @jax.jit
    def chunk(params, opt_state, rng):
        def body(carry, _):
            p, s, r = carry
            r, rr = jax.random.split(r)
            loss, grads = jax.value_and_grad(loss_fn)(p, rr)
            upd, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, upd)
            return (p, s, r), loss

        (params, opt_state, rng), losses = jax.lax.scan(
            body, (params, opt_state, rng), None, length=n_steps
        )
        return params, opt_state, rng, losses

    rng = jax.random.PRNGKey(0)
    params, opt_state, rng, losses = chunk(params, opt_state, rng)
    float(losses[-1])
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, rng, losses = chunk(params, opt_state, rng)
        float(losses[-1])
        best.append(time.perf_counter() - t0)
    med = sorted(best)[len(best) // 2]
    per_step = med / n_steps
    print(
        f"{tag:10s} {BATCH / per_step:9.1f} samples/s  {1e3 * per_step:.2f} ms/step"
        f"  (spread {min(best):.2f}-{max(best):.2f} s per {n_steps}-step chunk)"
    )
    return per_step


def main():
    params = lstm_ae.init(jax.random.PRNGKey(0), LATENT)
    sizes_enc = [(1, 128), (128, 64), (64, LATENT)]
    sizes_dec = [(LATENT, 64), (64, 128), (128, 1)]
    fwd_wave = make_wavefront_forward(sizes_enc, sizes_dec, LATENT)

    # numerical parity (eval mode, no dropout): the wavefront is the same
    # math with a fused input+recurrent matmul.  Measured f64 max err is
    # 4.8e-10 (exact semantics); in f32 the recurrence amplifies the
    # fused-vs-split accumulation-order difference to ~2e-4 over 64 steps,
    # so the f32 gate is 1e-3.
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 64, 1)), jnp.float32)
    a = fwd_seq(params, x, None, train=False)
    bww = fwd_wave(params, x, None, train=False)
    err = float(jnp.max(jnp.abs(a - bww)))
    print(f"eval-mode max |seq - wavefront| on (8,64): {err:.3e}")
    assert err < 1e-3, err

    # gradient parity (eval-mode loss so dropout masks don't differ)
    def loss_of(fwd):
        return lambda p: jnp.mean((fwd(p, x, None, False) - x) ** 2)

    ga = jax.grad(loss_of(lambda p, xx, r, t: fwd_seq(p, xx, r, t)))(params)
    gb = jax.grad(loss_of(fwd_wave))(params)
    gerr = max(
        float(jnp.max(jnp.abs(ga[k][kk] - gb[k][kk])))
        for k in ga
        for kk in ga[k]
    )
    print(f"grad max |seq - wavefront|: {gerr:.3e}")
    assert gerr < 1e-3, gerr

    if "--parity-only" in sys.argv:
        return

    for _ in range(2):
        time_train(lambda p, x, r, t: fwd_seq(p, x, r, t), params, "seq")
        time_train(fwd_wave, params, "wavefront")


if __name__ == "__main__":
    main()
