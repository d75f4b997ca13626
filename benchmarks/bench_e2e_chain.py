"""Consolidated end-to-end chain: the SAME synthetic dataset through

  (a) the reference-equivalent CPU path — host float64 extraction
      (python DWT delineation), torch-CPU LSTM-AE training/inference
      (the reference's own compute stack), sequential GBT classify, and
  (b) the TPU path — fused device extraction kernel, JAX LSTM-AE under
      jit, vectorized device grid search + PPV,

one wall-clock ratio per stage and overall (BASELINE.md north star:
>= 20x end-to-end).  Run on the real chip from the repo root:

    python -m benchmarks.bench_e2e_chain
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

N_CASES = 64
DURATION_S = 220.0
EPOCHS = 20
BATCH = 128
GS_CANDIDATES = 100
LATENT = 10


def _records():
    from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record

    return [synthetic_ecg_record(duration_s=DURATION_S, seed=1000 + c) for c in range(N_CASES)]


# ------------------------------ CPU reference path ---------------------------

def cpu_extract(records):
    from ae_waveforms_tpu.core.config import ExtractionConfig
    from ae_waveforms_tpu.data.extract import extract_case

    cfg = ExtractionConfig(precision="float64", delineation_engine="python")
    waves, feats = [], []
    for cid, rec in enumerate(records):
        r = extract_case(cid, rec, cfg, cache_dir=None)
        waves.append(r.waves)
        feats.append(r.features)
    return np.concatenate(waves), np.concatenate(feats)


def cpu_train_test(waves, epochs=EPOCHS):
    """torch-CPU LSTM autoencoder, the reference's training stack
    (model_classes.py:8-45 architecture, Adam, MSE)."""
    import torch
    import torch.nn as nn

    class AE(nn.Module):
        def __init__(self):
            super().__init__()
            self.e1 = nn.LSTM(1, 128, batch_first=True)
            self.e2 = nn.LSTM(128, 64, batch_first=True)
            self.e3 = nn.LSTM(64, LATENT, batch_first=True)
            self.d1 = nn.LSTM(LATENT, 64, batch_first=True)
            self.d2 = nn.LSTM(64, 128, batch_first=True)
            self.d3 = nn.LSTM(128, 1, batch_first=True)
            self.lin = nn.Linear(1, 1)

        def encode(self, x):
            h, _ = self.e1(x)
            h, _ = self.e2(h)
            _, (hn, _) = self.e3(h)
            return hn[-1]

        def forward(self, x):
            z = self.encode(x)
            rep = z.unsqueeze(1).repeat(1, x.size(1), 1)
            h, _ = self.d1(rep)
            h, _ = self.d2(h)
            h, _ = self.d3(h)
            return self.lin(h)

    x = torch.asarray(waves, dtype=torch.float32).unsqueeze(-1)
    model = AE().train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    crit = nn.MSELoss()
    g = torch.Generator().manual_seed(0)
    for _ in range(epochs):
        for i in torch.randperm(len(x), generator=g).split(BATCH):
            opt.zero_grad()
            loss = crit(model(x[i]), x[i])
            loss.backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        latents = torch.cat([model.encode(x[i : i + BATCH]) for i in range(0, len(x), BATCH)])
        final = float(crit(model(x[:BATCH]), x[:BATCH]))
    return latents.numpy(), final


def cpu_classify(latents):
    """Sequential grid search + size sweep + PPV with sklearn's C++
    histogram GBDT — the reference's compute shape (xgboost C++ under
    GridSearchCV, main_ae_classify.py:57-75): one native fit per
    candidate-fold / per seed, sequentially on host.  Same LHS candidate
    list, fold split, and seed+42 subsampling discipline as the TPU side."""
    from sklearn.ensemble import HistGradientBoostingClassifier
    from sklearn.metrics import precision_score, roc_auc_score

    from ae_waveforms_tpu.classify.harness import prepare_class_data
    from ae_waveforms_tpu.classify.lhs import lhs_param_dicts

    def fit_predict(params, X_tr, y_tr, X_te, seed):
        m = HistGradientBoostingClassifier(
            max_depth=params["max_depth"],
            max_iter=params["n_estimators"],
            learning_rate=params["learning_rate"],
            min_samples_leaf=params["min_child_weight"],
            random_state=seed,
        )
        m.fit(X_tr, y_tr)
        return m.predict_proba(X_te)[:, 1]

    rng = np.random.default_rng(0)
    control = latents + 0.05 * rng.standard_normal(latents.shape)
    sick = latents + 0.8 + 0.05 * rng.standard_normal(latents.shape)
    data = prepare_class_data(control, sick, test_size=max(50, len(latents) // 8))
    X = np.concatenate([data.control_train, data.sick_train])
    y = np.concatenate([np.zeros(len(data.control_train)), np.ones(len(data.sick_train))])

    # grid search: GS_CANDIDATES x 3-fold, sequential native fits
    params = lhs_param_dicts(GS_CANDIDATES, random_state=1)
    order = np.random.default_rng(1).permutation(len(y))
    folds = np.array_split(order, 3)
    best_score, best_params = -np.inf, params[0]
    for p in params:
        scores = []
        for f in range(3):
            te = folds[f]
            tr = np.concatenate([folds[g] for g in range(3) if g != f])
            scores.append(roc_auc_score(y[te], fit_predict(p, X[tr], y[tr], X[te], 1)))
        s = float(np.mean(scores))
        if s > best_score:
            best_score, best_params = s, p

    # size/seed sweep + PPV: one native fit per (size, seed)
    size = min(200, len(data.control_train))

    def seed_proba(sz, seed):
        r = np.random.default_rng(seed + 42)
        idx_c = r.choice(len(data.control_train), sz, replace=False)
        idx_s = r.choice(len(data.sick_train), sz, replace=False)
        X_tr = np.concatenate([data.control_train[idx_c], data.sick_train[idx_s]])
        y_tr = np.concatenate([np.zeros(sz), np.ones(sz)])
        return fit_predict(best_params, X_tr, y_tr, data.X_test, seed + 42)

    for sz in (size // 2, size):
        for seed in range(25):
            roc_auc_score(data.y_test, seed_proba(sz, seed))
    ppvs = []
    for seed in range(25):
        proba = seed_proba(size, seed)
        ppvs.append(precision_score(data.y_test, (proba >= 0.5).astype(int)))
    return {"median_ppv": float(np.median(ppvs))}


# -------------------------------- TPU path -----------------------------------

def tpu_extract(records):
    from ae_waveforms_tpu.core.config import ExtractionConfig
    from ae_waveforms_tpu.data.extract import extract_cases_batched

    cfg = ExtractionConfig(delineation_engine="device")
    recs = {cid: rec for cid, rec in enumerate(records)}
    results = extract_cases_batched(
        list(recs), lambda cid: recs[cid], cfg, cache_dir=None, windows_per_batch=512
    )
    return (
        np.concatenate([r.waves for r in results]),
        np.concatenate([r.features for r in results]),
    )


def tpu_train_test(waves, epochs=EPOCHS):
    import jax
    import jax.numpy as jnp

    from ae_waveforms_tpu.models import lstm_ae
    from ae_waveforms_tpu.train.optimizers import make_optimizer

    x = jnp.asarray(waves[:, :, None], jnp.float32)
    params = lstm_ae.init(jax.random.PRNGKey(0), LATENT)
    optimizer = make_optimizer("adam", 1e-3)
    opt_state = optimizer.init(params)
    n = len(waves)
    steps_per_epoch = (n + BATCH - 1) // BATCH

    # the whole run is ONE device program (epoch scan over step scans):
    # per-epoch dispatches each pay a relay round trip, a scan does not
    @jax.jit
    def train_all(params, opt_state, x, key):
        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, n)
            # wrap-pad so every scan step sees a full batch
            perm = jnp.concatenate([perm, perm])[: steps_per_epoch * BATCH]

            def step(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice(perm, (i * BATCH,), (BATCH,))
                xb = x[idx]

                def loss_fn(p):
                    pred = lstm_ae.forward(p, xb, train=False)
                    return jnp.mean((pred - xb) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), jnp.arange(steps_per_epoch)
            )
            return (params, opt_state), losses[-1]

        keys = jax.random.split(key, epochs)
        (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state), keys)
        return params, opt_state, losses[-1]

    params, opt_state, loss = train_all(params, opt_state, x, jax.random.PRNGKey(1))
    final = float(np.asarray(loss))

    # latent export: one padded dispatch
    encode = jax.jit(lambda p, xb: lstm_ae.encode(p, xb))
    pad = (-n) % 1024
    xp = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)]) if pad else x
    z = np.asarray(encode(params, xp))
    if z.ndim == 3:
        z = z[:, :, 0]
    return z[:n], final


def tpu_classify(latents):
    from ae_waveforms_tpu.classify.harness import (
        grid_search_cv,
        ppv_analysis,
        prepare_class_data,
        size_seed_sweep,
    )

    rng = np.random.default_rng(0)
    control = latents + 0.05 * rng.standard_normal(latents.shape)
    sick = latents + 0.8 + 0.05 * rng.standard_normal(latents.shape)
    data = prepare_class_data(control, sick, test_size=max(50, len(latents) // 8))
    X = np.concatenate([data.control_train, data.sick_train])
    y = np.concatenate([np.zeros(len(data.control_train)), np.ones(len(data.sick_train))])
    gs = grid_search_cv(X, y, n_candidates=GS_CANDIDATES, cv=3, vectorized=True, fits_per_call=24)
    size = min(200, len(data.control_train))
    size_seed_sweep(data, gs["best_params"], sizes=[size // 2, size], n_seeds=25, vectorized=True)
    return ppv_analysis(data, gs["best_params"], size=size, n_seeds=25, vectorized=True)


def run_side(side: str) -> None:
    from ae_waveforms_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()  # persistent cache: compiles amortize across runs
    records = _records()
    ex, tr, cl = (
        (tpu_extract, tpu_train_test, tpu_classify)
        if side == "tpu"
        else (cpu_extract, cpu_train_test, cpu_classify)
    )
    t0 = time.perf_counter()
    waves, feats = ex(records)
    t1 = time.perf_counter()
    latents, final = tr(waves)
    t2 = time.perf_counter()
    ppv = cl(latents)
    t3 = time.perf_counter()
    print("SIDE_RESULT " + json.dumps({
        "side": side,
        "extract_s": round(t1 - t0, 1),
        "train_test_s": round(t2 - t1, 1),
        "classify_s": round(t3 - t2, 1),
        "total_s": round(t3 - t0, 1),
        "n_windows": len(waves),
        "final_loss": round(final, 4),
        "median_ppv": round(ppv["median_ppv"], 4),
    }), flush=True)


def main():
    """Each side runs in its own subprocess so the platform is honest:
    the TPU side keeps the axon env; the CPU side strips it and pins
    JAX_PLATFORMS=cpu, so no cpu-path stage can silently ride the TPU."""
    import os
    import subprocess
    import sys

    print(f"{N_CASES} cases x {DURATION_S:.0f}s, {EPOCHS} epochs, "
          f"{GS_CANDIDATES}-candidate grid search", flush=True)
    stages = {}
    for side in ("tpu", "cpu"):
        env = dict(os.environ)
        if side == "cpu":
            for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                      "AXON_LOOPBACK_RELAY"):
                env.pop(k, None)
            env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, __file__, "--side", side],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stderr.write(proc.stderr[-2000:])
        for line in proc.stdout.splitlines():
            print(line, flush=True)
            if line.startswith("SIDE_RESULT "):
                stages[side] = json.loads(line[len("SIDE_RESULT "):])
        if side not in stages:
            raise RuntimeError(f"{side} side produced no SIDE_RESULT (rc={proc.returncode})")

    ratio = {
        k: round(stages["cpu"][k] / max(stages["tpu"][k], 1e-9), 1)
        for k in ("extract_s", "train_test_s", "classify_s", "total_s")
    }
    print("E2E_RESULT " + json.dumps({"stages": stages, "speedup": ratio}), flush=True)


if __name__ == "__main__":
    import sys

    if "--side" in sys.argv:
        run_side(sys.argv[sys.argv.index("--side") + 1])
    else:
        main()
