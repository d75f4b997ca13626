"""Reference-scale end-to-end DL classification benchmark.

The reference's `main_dl_classify.py` is its most training-compute-heavy
script (SURVEY §3.5): 11 sizes x 25 seeds x up to 153 epochs of a 3-layer
LSTM classifier on raw 320-sample beats, batch 512, AUC early stopping
(patience 50 / min_delta 5e-4) — 275 sequentially trained models.  This
benchmark runs the IDENTICAL harness (`classify/dl.py:dl_size_seed_sweep`)
at full reference scale on one chip, with all 25 seeds of a size trained
simultaneously in one vmapped epoch program — the seed axis amortises the
LSTM scan's sequential step latency, which is the dominant cost.

Synthetic cohort: normal-morphology beats vs hypokalaemia-like beats
(flattened T wave + mild ST depression), sampled on the np_waves beat grid
(320 samples, R at index 106 — data_create_arrays.py:17, median_sample.py:20-25)
with per-beat amplitude jitter and noise tuned so the task is learnable but
not saturated (size-dependent AUC, like the reference's Figure).

Usage (real chip, repo root, keep the axon env):

    python -m benchmarks.bench_dl_classify_full                # full sweep
    python -m benchmarks.bench_dl_classify_full --torch-probe  # CPU baseline:
        one torch epoch at two sizes -> extrapolated reference cost

Prints one ``BENCH_RESULT {...}`` JSON line with per-size wall + AUC.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

# np_waves beat grid: 320 samples at 500 Hz, R at index 106 (1/3 pre-R)
_BEAT_T = (np.arange(320) - 106) / 500.0


def make_waves(n_per_class: int = 12000, seed: int = 0):
    """(control, sick) raw-beat cohorts on the np_waves grid.

    Sick beats flatten the T wave (hypokalaemia-like) and add slight ST
    depression; per-beat T-amplitude jitter overlaps the classes so the
    classifier's AUC grows with training-set size instead of saturating.
    """
    from ae_waveforms_tpu.data.synthetic import synthetic_beat

    rng = np.random.default_rng(seed)

    def cohort(n, t_scale_mean, st_shift):
        base = synthetic_beat(_BEAT_T)  # shared morphology template
        # T-wave gaussian on the same grid, unit amplitude
        t_wave = 0.31 * np.exp(-((_BEAT_T - 0.24) ** 2) / (2 * 0.045**2))
        st_mask = ((_BEAT_T > 0.06) & (_BEAT_T < 0.20)).astype(float)
        amp = rng.normal(1.0, 0.06, (n, 1))
        t_scale = rng.normal(t_scale_mean, 0.25, (n, 1))
        waves = amp * (base[None, :] + (t_scale - 1.0) * t_wave[None, :])
        waves += st_shift * st_mask[None, :] * rng.normal(1.0, 0.3, (n, 1))
        waves += rng.normal(0, 0.04, (n, 320))
        # per-sample zscore, matching the extraction pipeline's window zscore
        waves = (waves - waves.mean(axis=1, keepdims=True)) / waves.std(axis=1, keepdims=True)
        return waves.astype(np.float32)

    control = cohort(n_per_class, 1.0, 0.0)
    sick = cohort(n_per_class, 0.45, -0.04)
    return control, sick


def run_device(n_per_class: int, out_dir: str | None, seed_chunk: int = 5,
               remat_chunk: int | None = None) -> None:
    import jax

    from ae_waveforms_tpu.classify.dl import DL_SIZES, dl_size_seed_sweep
    from ae_waveforms_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    control, sick = make_waves(n_per_class)
    print(f"cohort: {len(control)}/class, sizes {list(DL_SIZES)}", flush=True)

    per_size = []
    t_total = time.perf_counter()
    for size in DL_SIZES:
        t0 = time.perf_counter()
        rec = dl_size_seed_sweep(
            control, sick, sizes=(size,), n_seeds=25, vectorized=True,
            out_dir=out_dir, seed_chunk=seed_chunk, remat_chunk=remat_chunk,
        )[0]
        rec["wall_s"] = round(time.perf_counter() - t0, 1)
        per_size.append(rec)
    total = time.perf_counter() - t_total

    out = {
        "sizes": [r["size"] for r in per_size],
        "median_auc": [round(r["median_auc"], 4) for r in per_size],
        "wall_s": [r["wall_s"] for r in per_size],
        "total_s": round(total, 1),
        "n_models": 25 * len(per_size),
    }
    print("BENCH_RESULT " + json.dumps(out), flush=True)


def run_torch_probe(n_per_class: int) -> None:
    """Per-epoch torch-CPU cost of the reference's LSTMClassifier training
    loop (functions_dl/model_classes.py:8-32, main_dl_classify.py:63-105) at
    two sweep sizes; the full 275-model reference cost is extrapolated from
    these rates in BENCHMARKS.md (running it outright is infeasible here)."""
    import torch
    import torch.nn as nn

    class LSTMClassifier(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.LSTM(1, 128, batch_first=True)
            self.l2 = nn.LSTM(128, 64, batch_first=True)
            self.l3 = nn.LSTM(64, 64, batch_first=True)
            self.att = nn.Linear(64, 1)
            self.bn = nn.BatchNorm1d(64)
            self.fc1 = nn.Linear(64, 32)
            self.fc2 = nn.Linear(32, 1)

        def forward(self, x):
            h, _ = self.l1(x)
            h, _ = self.l2(h)
            h, _ = self.l3(h)
            w = torch.softmax(self.att(h), dim=1)
            pooled = (w * h).sum(dim=1)
            z = torch.relu(self.fc1(self.bn(pooled)))
            return torch.sigmoid(self.fc2(z))[:, 0]

    control, sick = make_waves(n_per_class)
    results = {}
    for size in (1000, 11500):
        n = int(2 * size * 0.8)
        X = torch.from_numpy(
            np.concatenate([control[:n // 2], sick[:n // 2]])[:, :, None]
        )
        y = torch.from_numpy(
            np.concatenate([np.zeros(n // 2, np.float32), np.ones(n // 2, np.float32)])
        )
        model = LSTMClassifier().train()
        opt = torch.optim.Adam(model.parameters(), lr=1e-4)
        crit = nn.BCELoss()
        t0 = time.perf_counter()
        for b0 in range(0, n, 512):
            opt.zero_grad()
            loss = crit(model(X[b0 : b0 + 512]), y[b0 : b0 + 512])
            loss.backward()
            opt.step()
        results[f"epoch_s_size_{size}"] = round(time.perf_counter() - t0, 2)
    print("TORCH_PROBE " + json.dumps(results), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--torch-probe", action="store_true")
    p.add_argument("--n_per_class", type=int, default=12000)
    p.add_argument("--out_dir", default=None)
    # 25-seed vmapped backward stores ~53 GB of LSTM scan activations
    # (25 x 512 batch x 320 steps x 3 layers) vs 15.75 GB HBM; 5-seed
    # chunks fit with one compiled program shape per size.  Alternatively
    # --remat_chunk 20 rematerialises the scans (identical gradients) so
    # --seed_chunk 25 fits in one program per size.
    p.add_argument("--seed_chunk", type=int, default=5)
    p.add_argument("--remat_chunk", type=int, default=0,
                   help="chunked LSTM remat length (0 = off)")
    args = p.parse_args()
    if args.torch_probe:
        run_torch_probe(args.n_per_class)
    else:
        run_device(args.n_per_class, args.out_dir, args.seed_chunk,
                   args.remat_chunk or None)
