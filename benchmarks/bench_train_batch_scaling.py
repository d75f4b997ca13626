"""AE train-step throughput vs batch size on one chip.

The reference trains at batch 128 (main_ae.py:58-66), and bench.py's
headline mirrors that config.  At B=128 the fused 100-step train chunk is
scan-latency bound (ROADMAP: unroll and stack-fusion both measured
negative), so samples/s should scale nearly linearly with batch until the
per-step LSTM matmuls saturate the MXU — this script measures where that
ceiling actually is.  Headroom beyond B=128 is real product capability:
``main_ae.py --batch_size`` is a user flag.

Usage (real chip, keep the axon env):
    python benchmarks/bench_train_batch_scaling.py [--steps 100] [--batches 128 256 512 1024]

Prints one JSON line per batch size:
    {"batch": B, "ms_per_step": ..., "samples_per_s": ..., "scaling_vs_128": ...}
"""

from __future__ import annotations

import argparse
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SEQ, LATENT = 320, 10


def measure(batch: int, n_steps: int, n_reps: int) -> float:
    import jax
    import jax.numpy as jnp

    from ae_waveforms_tpu.models.registry import MODEL_REGISTRY
    from ae_waveforms_tpu.parallel.mesh import data_mesh
    from ae_waveforms_tpu.train.loop import make_train_chunk
    from ae_waveforms_tpu.train.optimizers import make_optimizer

    mdef = MODEL_REGISTRY["LSTMAutoencoder"]
    mesh = data_mesh()
    params = mdef.init(jax.random.PRNGKey(0), LATENT)
    optimizer = make_optimizer("adam", 1e-3)
    opt_state = optimizer.init(params)

    n_data = 20 * batch
    rng_np = np.random.default_rng(0)
    data_x = jnp.asarray(rng_np.standard_normal((n_data, SEQ, 1)), jnp.float32)
    idx = jnp.asarray(rng_np.integers(0, n_data, size=(n_steps, batch)).astype(np.int32))
    mask = jnp.ones((n_steps, batch), bool)
    schedule = lambda step: jnp.asarray(1e-3, jnp.float32)  # noqa: E731
    run_chunk = make_train_chunk(mdef, optimizer, "mse", schedule, mesh)
    rng = jax.random.PRNGKey(1)
    one = jnp.asarray(1.0, jnp.float32)

    def dispatch():
        nonlocal params, opt_state, rng
        params, opt_state, rng, losses, _ = run_chunk(
            params, opt_state, rng, data_x, idx, mask,
            jnp.asarray(0, jnp.int32), one, n_steps,
        )
        return float(np.asarray(losses[-1]))  # transfer == sync

    dispatch()  # compile + warmup
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        dispatch()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main():
    from ae_waveforms_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batches", type=int, nargs="*", default=[128, 256, 512, 1024])
    args = ap.parse_args()

    base_rate = None
    for batch in args.batches:
        med = measure(batch, args.steps, args.reps)
        rate = args.steps * batch / med
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "batch": batch,
            "ms_per_step": round(1e3 * med / args.steps, 3),
            "samples_per_s": round(rate, 1),
            "scaling_vs_128": round(rate / base_rate, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
