"""A/B the GBT tree-scan histogram backends on chip: fused Pallas kernel
(ops/gbt_hist_pallas.py) vs the batched-XLA one-hot matmul.

Round-2 elimination benchmarking (bench_gbt_v2.py, ROADMAP) put the scan
body at ~2 ms/tree per 24-fit chunk with the cost in HBM-bound operand
materialisation ("fake-histogram floor"); the Pallas kernel builds both
matmul operands in VMEM.  This script measures ms/tree for both backends at
the harness shape (n=12500, F=10, depth 6) for 64 and 256 bins, and checks
the fitted pool margins agree.

Run on the real chip:  python benchmarks/bench_gbt_pallas.py
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

S, N, F, DEPTH, TREES = 24, 12500, 10, 6, 50
REPS = 5

enable_compilation_cache()
rng = np.random.default_rng(0)
X = rng.standard_normal((N, F)).astype(np.float32)
y = (X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.standard_normal(N) > 0).astype(np.float32)
yj = jnp.asarray(y)
row_w = jnp.asarray((rng.uniform(size=(S, N)) > 0.33).astype(np.float32))
rngs = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))
sweep_args = (
    row_w, rngs,
    jnp.full(S, 0.1, jnp.float32), jnp.full(S, 1.0, jnp.float32),
    jnp.full(S, 3.0, jnp.float32), jnp.full(S, 0.8, jnp.float32),
    jnp.full(S, 0.8, jnp.float32), jnp.full(S, TREES, jnp.int32),
)

for n_bins in (64, 256):
    bins = jnp.asarray(bin_data(X, compute_bin_edges(X, n_bins)))
    margins = {}
    for impl in ("xla", "pallas"):
        def run():
            _, m = fit_gbt_sweep_margins(
                bins, yj, *sweep_args,
                max_depth=DEPTH, n_estimators=TREES, n_bins=n_bins,
                hist_impl=impl,
            )
            return np.asarray(m)  # host transfer == the only real sync here

        t0 = time.perf_counter()
        margins[impl] = run()  # compile + warmup
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            f"bins={n_bins:3d} {impl:6s}: {1e3 * med / TREES:7.3f} ms/tree "
            f"(median of {REPS}; spread {min(times):.3f}-{max(times):.3f} s "
            f"per {TREES}-tree chunk; first call {compile_s:.1f} s)",
            flush=True,
        )
    d = np.abs(margins["xla"] - margins["pallas"]).max()
    print(f"bins={n_bins:3d} margin max |xla - pallas| = {d:.3e}", flush=True)
