"""Deep-bucket GBT sweep: XLA chunk-size retune + mixed per-level backend.

The production grid search (classify/harness.py) buckets LHS candidates into
a shallow (depth<=6) and a deep (depth<=10) group.  The deep bucket routes
to XLA whole — the fused Pallas kernel's VMEM accumulator cannot hold
96 fits x 2^9 left children — but its levels 0-5 are individually
pallas-feasible, and the 96-fit chunk size was tuned FOR the Pallas kernel
(XLA's per-level A-operand HBM traffic scales with S, so its optimum may be
smaller).  VERDICT r3 item 6 / ROADMAP candidate #0: measure both axes on
chip before building anything further.

Axes measured at the production deep-bucket shape (n=12500, F=10, bins=64,
max_depth=10):

  * XLA at S in {24, 48, 96, 192}  — the chunk-size retune
  * mixed:<K> at each S, K = the deepest pallas-feasible level count
    (classify/gbt.py _max_pallas_levels)

Reports ms/tree PER FIT and the implied walltime of the production deep bucket
(444 of the 1000 LHS candidates at random_state=1 land at depth >= 7,
x 3 folds x 275 mean trees).

Run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/bench_gbt_mixed.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ae_waveforms_tpu.classify.gbt import (
    _max_pallas_levels, bin_data, compute_bin_edges, fit_gbt_sweep_margins,
)
from ae_waveforms_tpu.core.runtime import enable_compilation_cache

N, F, BINS, DEPTH, TREES = 12500, 10, 64, 10, 50
REPS = 5
DEEP_FITS = 444 * 3  # depth>=7 share of the production LHS grid x CV folds
MEAN_TREES = 275

enable_compilation_cache()
rng = np.random.default_rng(0)
X = rng.standard_normal((N, F)).astype(np.float32)
y = (X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.standard_normal(N) > 0).astype(np.float32)
yj = jnp.asarray(y)
bins = jnp.asarray(bin_data(X, compute_bin_edges(X, BINS)))

for S in (24, 48, 96, 192):
    row_w = jnp.asarray((rng.uniform(size=(S, N)) > 0.33).astype(np.float32))
    rngs = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))
    args = (
        row_w, rngs,
        jnp.full(S, 0.1, jnp.float32), jnp.full(S, 1.0, jnp.float32),
        jnp.full(S, 3.0, jnp.float32), jnp.full(S, 0.8, jnp.float32),
        jnp.full(S, 0.8, jnp.float32), jnp.full(S, TREES, jnp.int32),
    )
    k = _max_pallas_levels(S, F * BINS, DEPTH)
    for impl in ("xla", f"mixed:{k}"):
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
        bucket_s = per_fit_tree * 1e-3 * DEEP_FITS * MEAN_TREES
        print(
            f"S={S:3d} {impl:8s}: {1e3 * med / TREES:8.3f} ms/tree/chunk  "
            f"{per_fit_tree:7.4f} ms/tree/fit  -> deep bucket ~{bucket_s:6.0f} s  "
            f"(spread {min(times):.3f}-{max(times):.3f} s)",
            flush=True,
        )
