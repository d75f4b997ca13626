"""Shared- vs per-config-split seed-study spread (train/multi.py).

The default multi-config trainer shares ONE cfg.seed patient split across
all S configs (a fixed-split seed study); sequential seed studies redraw
the split under each seed (main_ae.py:128-133 seeds numpy globally before
split_datasets), so their reported variance includes patient-composition
variance.  ``per_config_splits=True`` reproduces the sequential behaviour.
This bench quantifies what the shared-split default UNDERSTATES: the
25-seed best-val-loss spread under both modes on the same synthetic
dataset, same architecture, same step budget.

Run: PYTHONPATH=/root/repo python benchmarks/bench_split_variance.py
(one JSON line per mode + a summary line; works on CPU or TPU).
"""
from __future__ import annotations

import json
import time

import numpy as np

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
from ae_waveforms_tpu.core.schema import ArraySet
from ae_waveforms_tpu.train.multi import train_ae_multi

N_SEEDS = 25
MAX_STEPS = 120


def toy_arrays(n=4000, n_cases=200, seed=0) -> ArraySet:
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, 320, dtype=np.float32)
    case_ids = np.repeat(np.arange(n_cases), n // n_cases)
    # per-case morphology (patient-level structure, so split membership
    # actually moves the achievable loss)
    amp = 0.5 + rng.uniform(0, 1.0, n_cases)[case_ids]
    width = 0.02 + rng.uniform(0, 0.04, n_cases)[case_ids]
    waves = (
        amp[:, None] * np.exp(-((t[None, :] - 0.33) ** 2) / width[:, None])
        + 0.1 * rng.standard_normal((n, 320))
    ).astype(np.float32)
    info = np.stack([case_ids, np.arange(n)], axis=1).astype(np.int64)
    return ArraySet(waves=waves, features=np.zeros((n, 35), np.float32), info=info)


def run_mode(cfg, arrays, per_config: bool):
    seeds = list(range(3, 3 + N_SEEDS))
    t0 = time.perf_counter()
    res = train_ae_multi(cfg, seeds, arrays=arrays, max_steps=MAX_STEPS,
                         per_config_splits=per_config)
    wall = time.perf_counter() - t0
    bv = np.asarray(res.best_val, np.float64)
    rec = {
        "mode": "per_config" if per_config else "shared",
        "n_seeds": N_SEEDS,
        "best_val_median": round(float(np.median(bv)), 6),
        "best_val_std": round(float(np.std(bv)), 6),
        "best_val_iqr": round(float(np.percentile(bv, 75) - np.percentile(bv, 25)), 6),
        "best_val_range": round(float(bv.max() - bv.min()), 6),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    enable_compilation_cache()
    import tempfile

    arrays = toy_arrays()
    with tempfile.TemporaryDirectory() as td:
        cfg = TrainConfig(
            dataset_dir=td, results_dir=td, model_class="LSTMAutoencoder",
            latent_size=3, batch_size=64, epochs=2, validation_interval=10,
            split_size_val=0.2, split_size_test=0.1, lr=3e-3, seed=1,
            plotting=False,
        )
        shared = run_mode(cfg, arrays, per_config=False)
        percfg = run_mode(cfg, arrays, per_config=True)
    ratio = (percfg["best_val_std"] / shared["best_val_std"]
             if shared["best_val_std"] else float("nan"))
    print(json.dumps({
        "bench": "split_variance",
        "std_ratio_per_config_over_shared": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
