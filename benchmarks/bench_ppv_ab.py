"""A/B the north-star PPV metric across GBDT implementations (VERDICT r2 #3).

Runs the COMPLETE classification harness — 1000-candidate LHS x 3-fold CV
grid search, then the 25-seed PPV analysis at size 6000 — on the SAME
synthetic cohort as `bench_classify_full.py`, once per backend:

- ``--backend jax``      the production device GBT (vectorized sweep);
- ``--backend sklearn``  HistGradientBoostingClassifier, sklearn's
  independent C++ histogram GBDT, through the identical harness procedure
  (sequential; single-core container, expect hours for the grid search).

Each run prints one JSON line ``PPV_AB_RESULT {...}``; compare the two in
BENCHMARKS.md.  A drift in median PPV beyond the seed-noise IQR would
indicate the xgboost -> JAX-GBT substitution changed task quality.

Reference procedure: analysis_PPV_hypokalaemia.py:57-110.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.bench_classify_full import make_latents


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--backend", choices=["jax", "sklearn"], required=True)
    p.add_argument("--gs_candidates", type=int, default=1000)
    p.add_argument("--seeds", type=int, default=25)
    args = p.parse_args()

    from ae_waveforms_tpu.classify.harness import (
        grid_search_cv,
        ppv_analysis,
        prepare_class_data,
    )

    control, sick = make_latents()
    data = prepare_class_data(control, sick)
    X = np.concatenate([data.control_train, data.sick_train], axis=0)
    y = np.concatenate([np.zeros(len(data.control_train)), np.ones(len(data.sick_train))])
    print(f"backend={args.backend} train rows: {len(y)}, test rows: {len(data.y_test)}", flush=True)

    t0 = time.perf_counter()
    if args.backend == "jax":
        gs = grid_search_cv(X, y, n_candidates=args.gs_candidates, cv=3,
                            vectorized=True, verbose=True, fits_per_call=24)
    else:
        gs = grid_search_cv(X, y, n_candidates=args.gs_candidates, cv=3,
                            verbose=True, backend="sklearn")
    t_gs = time.perf_counter() - t0
    print("best:", gs, flush=True)

    t0 = time.perf_counter()
    ppv = ppv_analysis(data, gs["best_params"], size=6000, n_seeds=args.seeds,
                       vectorized=(args.backend == "jax"), backend=args.backend)
    t_ppv = time.perf_counter() - t0

    out = {
        "backend": args.backend,
        "gs_candidates": args.gs_candidates,
        "best_cv_auc": round(gs["best_score"], 4),
        "best_params": gs["best_params"],
        "median_auc": round(ppv["median_auc"], 4),
        "iqr_auc": [round(ppv["q1_auc"], 4), round(ppv["q3_auc"], 4)],
        "median_ppv": round(ppv["median_ppv"], 4),
        "iqr_ppv": [round(ppv["q1_ppv"], 4), round(ppv["q3_ppv"], 4)],
        "grid_search_s": round(t_gs, 1),
        "ppv_s": round(t_ppv, 1),
    }
    print("PPV_AB_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
