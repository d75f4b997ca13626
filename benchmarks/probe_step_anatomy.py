"""Anatomy of the fused train-chunk wall: dispatch overhead vs compute.

Three questions, all answered by walls of the SHIPPED programs on chip:

1. How much of a 100-step fused-chunk dispatch is per-dispatch (relay)
   overhead vs per-step compute?  Measure n_steps in {25, 100, 400} at
   B=128: the linear fit's intercept is the dispatch overhead, the slope
   the true per-step time.
2. Does the per-step time grow with batch width?  B in {128, 1024} at
   100 steps.
3. Does the vmapped multi-config program's per-step time grow with S?
   S in {1, 2, 4, 8} at 100 steps (bench.bench_multi_tpu's exact program).

Run (real chip): PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/probe_step_anatomy.py
"""
from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SEQ, LATENT = 320, 10


def measure_chunk(batch: int, n_steps: int, n_reps: int = 5) -> float:
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
        return float(np.asarray(losses[-1]))

    dispatch()
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        dispatch()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    from ae_waveforms_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    import bench

    for n_steps in (25, 100, 400):
        med = measure_chunk(128, n_steps)
        print(json.dumps({
            "probe": "steps", "batch": 128, "n_steps": n_steps,
            "wall_s": round(med, 4),
            "ms_per_step": round(1e3 * med / n_steps, 3),
        }), flush=True)
    for batch in (128, 1024):
        med = measure_chunk(batch, 100)
        print(json.dumps({
            "probe": "batch", "batch": batch, "n_steps": 100,
            "wall_s": round(med, 4),
            "ms_per_step": round(1e3 * med / 100, 3),
            "samples_per_s": round(100 * batch / med, 1),
        }), flush=True)
    for S in (1, 2, 4, 8):
        rate = bench.bench_multi_tpu(n_configs=S, n_steps=100, n_reps=5)
        print(json.dumps({
            "probe": "vmap_S", "S": S, "batch": 128, "n_steps": 100,
            "effective_samples_per_s": round(rate, 1),
            "ms_per_step_all_S": round(1e3 * S * 100 * 128 / rate / 100, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
