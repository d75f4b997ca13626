"""Cross-family co-scheduling experiment (the last idle-width lever).

Hypothesis (VERDICT r4 #6): the flagship LSTM-AE's 320-step scan is
latency-bound and leaves the MXU ~98% idle, while the conv-AE is pure MXU
work — and the reference's own analysis consumes BOTH families
(analysis_performance_traditional_vs_ae.py:226-230).  If one program
interleaving an LSTM-config train step and a conv-config train step can
hide part of the conv work inside the LSTM scan's bubbles, co-scheduling
recovers throughput the seed-width axis can't.

What XLA:TPU can and cannot do here, measured: a fused train chunk scans
over steps; the LSTM layers are `lax.scan` (while) ops that the static
scheduler treats as opaque units, so conv ops cannot be interleaved INTO
them — any overlap must come from the scheduler placing independent conv
ops in the same instruction stream around the LSTM scans' DMA/bubble
slack.

Protocol: time (a) an LSTM-only 100-step fused chunk, (b) a conv-only
chunk, (c) a COMBINED chunk whose scan step trains one batch of each
family (independent params/opt/batches).  Gain = (Ta + Tb) / Tc; 1.0 is
a tie (pure serialisation).  Ship only on a win; record the result either
way in BENCHMARKS.md.

Run: PYTHONPATH=/root/repo python benchmarks/bench_cofamily.py
"""
from __future__ import annotations

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from ae_waveforms_tpu.core.runtime import enable_compilation_cache
from ae_waveforms_tpu.models.registry import MODEL_REGISTRY
from ae_waveforms_tpu.train.optimizers import make_optimizer

BATCH, SEQ, LATENT, N_STEPS, N_REPS = 128, 320, 10, 100, 5


def _family_state(model_class: str, key, batch: int = BATCH):
    mdef = MODEL_REGISTRY[model_class]
    params = mdef.init(key, LATENT)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    rng_np = np.random.default_rng(0)
    shape = (batch, 1, SEQ) if mdef.channel_first else (batch, SEQ, 1)
    x = jnp.asarray(rng_np.standard_normal(shape), jnp.float32)
    return mdef, opt, params, opt_state, x


def _one_family_step(mdef, opt, params, opt_state, x, key):
    def loss_fn(p):
        pred = mdef.forward(p, x, train=True, rng=key, rate=0.2)
        return jnp.mean((pred - x) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params, opt_state, loss


def make_chunk(fams):
    """One jitted program scanning N_STEPS steps, each step training one
    batch for EVERY family in ``fams`` (1 or 2 families)."""

    def chunk(states, rng):
        def step(carry, _):
            states, rng = carry
            rng, *keys = jax.random.split(rng, len(fams) + 1)
            new_states, losses = [], []
            for (mdef, opt, x), (p, o), k in zip(fams, states, keys):
                p, o, l = _one_family_step(mdef, opt, p, o, x, k)
                new_states.append((p, o))
                losses.append(l)
            return (tuple(new_states), rng), jnp.stack(losses)

        (states, rng), losses = jax.lax.scan(
            step, (states, rng), None, length=N_STEPS)
        return states, rng, losses

    return jax.jit(chunk, donate_argnums=(0,))


def time_chunk(fams, label):
    run = make_chunk([(m, o, x) for m, o, _, _, x in fams])
    # the chunk donates its carry buffers — give each timed program its own
    # copies so families can appear in several programs
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)  # noqa: E731
    states = tuple((copy(p), copy(o)) for _, _, p, o, _ in fams)
    rng = jax.random.PRNGKey(1)

    def dispatch(states, rng):
        states, rng, losses = run(states, rng)
        jax.block_until_ready(losses)
        return states, rng

    states, rng = dispatch(states, rng)  # compile + warmup
    times = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        states, rng = dispatch(states, rng)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(json.dumps({
        "program": label, "ms_per_step": round(1e3 * med / N_STEPS, 3),
        "reps_s": [round(t, 3) for t in times],
    }), flush=True)
    return med


def main():
    enable_compilation_cache()
    lstm = _family_state("LSTMAutoencoder", jax.random.PRNGKey(0))
    conv = _family_state("LeNet5AutoencoderAvgPool", jax.random.PRNGKey(2))
    t_l = time_chunk([lstm], "lstm_only")
    t_c = time_chunk([conv], "conv_only")
    t_b = time_chunk([lstm, conv], "combined")
    gain = (t_l + t_c) / t_b
    # second probe: can a BIG conv batch hide inside the LSTM scan's idle
    # MXU?  If the combined wall equals the serial sum, the scheduler
    # cannot interleave into the while op and the "idle MXU" is
    # unreachable from another op's work.
    conv_big = _family_state("LeNet5AutoencoderAvgPool", jax.random.PRNGKey(3),
                             batch=2048)
    t_cb = time_chunk([conv_big], "conv_b2048_only")
    t_bb = time_chunk([lstm, conv_big], "combined_b2048")
    print(json.dumps({
        "probe": "big_conv_overlap",
        "hidden_fraction": round(1.0 - (t_bb - t_l) / t_cb, 3),
    }), flush=True)
    # effective samples/s: the combined program trains 2*BATCH samples/step
    print(json.dumps({
        "bench": "cofamily",
        "gain_vs_serial": round(gain, 3),
        "combined_samples_per_s": round(2 * N_STEPS * BATCH / t_b, 1),
        "lstm_only_samples_per_s": round(N_STEPS * BATCH / t_l, 1),
        "verdict": "win" if gain > 1.1 else ("tie" if gain > 0.95 else "loss"),
    }))


if __name__ == "__main__":
    main()
