"""Reference-scale classification benchmark (ROADMAP item 1).

Measures the complete main_ae_classify workload at the reference's own
scale on one chip (reference: main_ae_classify.py — 1000-candidate LHS
grid search x 3-fold CV, 11-size x 25-seed AUC sweep, 25-seed PPV
analysis at size 6000), using the vectorized device harness.

Run on the real chip from the repo root (keep the axon env):

    python -m benchmarks.bench_classify_full

(-m, not a file path: the package imports resolve via the cwd, and setting
PYTHONPATH breaks the axon TPU plugin registration in this container.)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


import json
import time

import numpy as np


def make_latents(n_per_class: int = 6500, d: int = 10, seed: int = 0):
    """Synthetic latent cohorts with a realistic ~0.9-AUC class signal."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_per_class, d)).astype(np.float32)
    control = base
    shift = rng.standard_normal(d).astype(np.float32)
    shift /= np.linalg.norm(shift)
    sick = rng.standard_normal((n_per_class, d)).astype(np.float32) + 1.2 * shift
    return control, sick


def main() -> None:
    from ae_waveforms_tpu.classify.harness import (
        grid_search_cv,
        ppv_analysis,
        prepare_class_data,
        size_seed_sweep,
    )

    import jax

    print("devices:", jax.devices(), flush=True)
    control, sick = make_latents()
    data = prepare_class_data(control, sick)  # 6250/class train, 500 test rows
    X = np.concatenate([data.control_train, data.sick_train], axis=0)
    y = np.concatenate(
        [np.zeros(len(data.control_train)), np.ones(len(data.sick_train))]
    )
    print(f"train rows: {len(y)}, test rows: {len(data.y_test)}", flush=True)

    stages = {}

    t0 = time.perf_counter()
    result = grid_search_cv(
        X, y, n_candidates=1000, cv=3, vectorized=True, verbose=True, fits_per_call=24
    )
    stages["grid_search_1000x3fold_s"] = round(time.perf_counter() - t0, 1)
    print("best:", result, flush=True)

    t0 = time.perf_counter()
    size_seed_sweep(data, result["best_params"], n_seeds=25, vectorized=True)
    stages["size_seed_sweep_11x25_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    ppv = ppv_analysis(data, result["best_params"], size=6000, n_seeds=25, vectorized=True)
    stages["ppv_25seed_s"] = round(time.perf_counter() - t0, 1)

    out = {
        "best_auc": round(result["best_score"], 4),
        "median_ppv": round(ppv["median_ppv"], 4),
        "stages": stages,
        "total_s": round(sum(stages.values()), 1),
    }
    print("BENCH_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
