"""End-to-end offline demo: synthetic VitalDB-like extraction -> conv-AE
training -> test/latent export -> traditional-vs-AE analysis -> GBT
classification with PPV.

Usage: python examples/run_e2e.py [--workdir DIR] [--cases 12] [--epochs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="./e2e_run")
    p.add_argument("--cases", type=int, default=12)
    p.add_argument("--duration", type=float, default=120.0)
    p.add_argument("--epochs", type=int, default=2)
    args = p.parse_args()

    t0 = time.time()
    data_dir = os.path.join(args.workdir, "data")
    results_dir = os.path.join(args.workdir, "results")

    # 1. extraction (cached, idempotent)
    from ae_waveforms_tpu.cli.extract import main as extract_main

    extract_main(["--out", data_dir, "--cases", str(args.cases), "--duration", str(args.duration)])

    # 2. AE training
    from ae_waveforms_tpu.core.config import TrainConfig
    from ae_waveforms_tpu.train.loop import main_train

    cfg = TrainConfig(
        dataset_dir=data_dir,
        results_dir=results_dir,
        model_class="LeNet5AutoencoderAvgPool",
        latent_size=10,
        batch_size=32,
        epochs=args.epochs,
        validation_interval=5,
        split_size_val=0.2,
        split_size_test=0.2,
        # seed 4: the legacy patient-level draw gives 6/3/3 cases for
        # train/val/test at 12 cases (seed 1 leaves test empty)
        seed=4,
        plotting=False,
    )
    run_dir = main_train(cfg)
    run_name = os.path.basename(run_dir)

    # 3. test + latent export
    from ae_waveforms_tpu.train.eval import main_test

    cfg_test = cfg.replace(mode="test", trained_model=run_name)
    _, (loss, rmse, _, prd, _), _, latents = main_test(cfg_test)

    # 4. traditional reconstruction comparison (uses the train run's split)
    import glob
    import shutil

    for f in glob.glob(os.path.join(run_dir, "indices_test_*.npy")):
        shutil.copy(f, data_dir)
    from ae_waveforms_tpu.analysis.trad_vs_ae import compare

    compare(cfg, run_sigma_search=True, search_candidates=128)

    # 5. classification on latents (two synthetic cohorts from the latents)
    from ae_waveforms_tpu.classify.harness import grid_search_cv, ppv_analysis, prepare_class_data

    rng = np.random.default_rng(0)
    # amplify the handful of exported latents into two synthetic cohorts
    reps = max(1, 200 // max(len(latents), 1))
    base = np.tile(latents, (reps, 1))
    control = base + 0.05 * rng.standard_normal(base.shape)
    sick = base + 0.6 + 0.05 * rng.standard_normal(base.shape)
    data = prepare_class_data(control, sick, test_size=max(8, len(base) // 4))
    X = np.concatenate([data.control_train, data.sick_train])
    y = np.concatenate([np.zeros(len(data.control_train)), np.ones(len(data.sick_train))])
    gs = grid_search_cv(X, y, n_candidates=4, cv=2, random_state=1)
    ppv_analysis(data, gs["best_params"], size=min(64, len(data.control_train)), n_seeds=3)

    print(f"\nE2E done in {time.time() - t0:.1f}s  (AE test rmse {rmse:.4f}, prd {prd:.2f}%)")


if __name__ == "__main__":
    main()
