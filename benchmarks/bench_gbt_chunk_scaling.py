"""Chunk-size scaling of the GBT sweep fit: XLA vs Pallas histograms.

The shipped grid search runs 3,000 CV fits in S-sized chunks (one dispatch
per chunk).  XLA's per-level A-operand / node-one-hot HBM traffic scales
with S while the Pallas kernel builds A in VMEM, so larger chunks should
favour the kernel — and fewer dispatches also cut the tunnelled relay's
per-dispatch cost on congested days.  Reports ms/tree PER FIT (lower =
faster grid search) and the implied 1000-candidate x 3-fold walltime.

Run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/bench_gbt_chunk_scaling.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ae_waveforms_tpu.classify.gbt import (
    bin_data, compute_bin_edges, fit_gbt_sweep_margins,
)
from ae_waveforms_tpu.core.runtime import enable_compilation_cache

N, F, BINS, DEPTH, TREES = 12500, 10, 64, 6, 50
REPS = 5

enable_compilation_cache()
rng = np.random.default_rng(0)
X = rng.standard_normal((N, F)).astype(np.float32)
y = (X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.standard_normal(N) > 0).astype(np.float32)
yj = jnp.asarray(y)
bins = jnp.asarray(bin_data(X, compute_bin_edges(X, BINS)))

for S in (24, 48, 96):
    row_w = jnp.asarray((rng.uniform(size=(S, N)) > 0.33).astype(np.float32))
    rngs = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))
    args = (
        row_w, rngs,
        jnp.full(S, 0.1, jnp.float32), jnp.full(S, 1.0, jnp.float32),
        jnp.full(S, 3.0, jnp.float32), jnp.full(S, 0.8, jnp.float32),
        jnp.full(S, 0.8, jnp.float32), jnp.full(S, TREES, jnp.int32),
    )
    for impl in ("xla", "pallas"):
        def run():
            _, m = fit_gbt_sweep_margins(
                bins, yj, *args, max_depth=DEPTH, n_estimators=TREES,
                n_bins=BINS, hist_impl=impl,
            )
            return np.asarray(m)

        run()  # compile + warm
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        per_fit_tree = 1e3 * med / TREES / S  # ms per tree per fit
        # grid search: 3000 fits x ~275 trees mean candidate
        grid_s = per_fit_tree * 1e-3 * 3000 * 275
        print(
            f"S={S:3d} {impl:6s}: {1e3 * med / TREES:8.3f} ms/tree/chunk  "
            f"{per_fit_tree:7.4f} ms/tree/fit  -> grid ~{grid_s:6.0f} s  "
            f"(spread {min(times):.3f}-{max(times):.3f} s)",
            flush=True,
        )
