"""Classifier evaluation harness (capability twin of main_ae_classify.py,
main_ml_classify.py and analysis_PPV_hypokalaemia.py).

Shared procedure, replicated exactly:

- cap each class at 6500 samples; the fixed test set is the last
  min(250, ...) rows of each class (main_ae_classify.py:43-49);
- hyperparameter selection: an LHS candidate list scored by K-fold
  cross-validated ROC-AUC on up to 6000 rows per class
  (main_ae_classify.py:57-77);
- evaluation: for each training size and 25 seeds, subsample
  ``rng(seed + 42).choice`` rows per class, fit with random_state
  ``seed + 42``, score AUC on the fixed test set; report median and IQR
  (main_ae_classify.py:82-115);
- PPV variant: size 6000 only, adding precision at threshold 0.5
  (analysis_PPV_hypokalaemia.py:78-110);
- handcrafted-feature variant: column 5 (T Duration) deleted from the
  10-feature matrix before fitting (main_ml_classify.py:110).

The model is the JAX GBDT; every hyperparameter (including the effective
tree depth, via traced depth limits) is a runtime value, so the whole
1000-candidate LHS sweep reuses two compiled programs (one per coarse depth
bucket).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from sklearn.metrics import precision_score, roc_auc_score

from ae_waveforms_tpu.classify.gbt import GBTClassifier
from ae_waveforms_tpu.classify.lhs import lhs_param_dicts


def _classifier_cls(backend: str):
    """GBDT implementation selector: 'jax' = the device GBT (production),
    'sklearn' = HistGradientBoostingClassifier (independent C++ A/B oracle,
    classify/sklearn_gbt.py)."""
    if backend == "jax":
        return GBTClassifier
    if backend == "sklearn":
        from ae_waveforms_tpu.classify.sklearn_gbt import SklearnGBTClassifier

        return SklearnGBTClassifier
    raise ValueError(f"unknown GBDT backend {backend!r}")

__all__ = [
    "prepare_class_data",
    "grid_search_cv",
    "size_seed_sweep",
    "ppv_analysis",
    "DEFAULT_SIZES",
]

DEFAULT_SIZES = [100, 250, 500, 750, 1000, 1500, 2000, 2500, 3000, 4000, 6000]


@dataclass
class ClassData:
    control_train: np.ndarray
    sick_train: np.ndarray
    X_test: np.ndarray
    y_test: np.ndarray


def prepare_class_data(
    control_features: np.ndarray,
    sick_features: np.ndarray,
    cap: int = 6500,
    test_size: int = 250,
) -> ClassData:
    control = np.asarray(control_features)[:cap]
    sick = np.asarray(sick_features)[:cap]
    ts = min(test_size, len(control) - 1, len(sick) - 1)
    X_test = np.concatenate([control[-ts:], sick[-ts:]], axis=0)
    y_test = np.concatenate([np.zeros(ts), np.ones(ts)])
    return ClassData(control[:-ts], sick[:-ts], X_test, y_test)


def select_by_ids(info_ids: np.ndarray, features: np.ndarray, wanted_ids: np.ndarray) -> np.ndarray:
    """Row-select features whose case id appears in the wanted list
    (main_ae_classify.py:40-44)."""
    idx = np.nonzero(np.isin(info_ids, wanted_ids))[0]
    return np.asarray(features)[idx]


def grid_search_cv(
    X: np.ndarray,
    y: np.ndarray,
    n_candidates: int = 1000,
    cv: int = 3,
    random_state: int = 1,
    verbose: bool = False,
    vectorized: bool = False,
    fits_per_call: int = 96,
    backend: str = "jax",
) -> Dict:
    """LHS candidates scored by K-fold ROC-AUC; returns the best param dict.

    Own implementation (the reference uses sklearn GridSearchCV over
    single-point grids with joblib fan-out).  ``vectorized=True`` buckets the
    candidates into two coarse depth groups and fits chunks of candidates in
    vmapped device programs (every hyperparameter incl. depth is traced),
    turning the 3000-fit sweep into a handful of compiled calls.  Quantile
    bin edges are computed per fold from the training rows only — the same
    no-leakage discipline as the reference's GridSearchCV + XGBoost.

    ``fits_per_call=96`` is the measured per-fit optimum on chip for the
    shallow (depth<=6) bucket (benchmarks/bench_gbt_chunk_scaling.py:
    0.049 ms/tree/fit at 96 with the Pallas histogram kernel vs 0.068 at
    24 / 0.094 at 48), and bigger chunks also mean fewer dispatches through
    a congested relay.  The deep (depth<=10) bucket has its own measured
    optimum — 24-fit chunks with the mixed per-level histogram backend
    (benchmarks/bench_gbt_mixed.py; see ``bucket_plan`` in the vectorized
    path) — applied automatically; ``fits_per_call`` only caps it."""
    if n_candidates < 1:
        raise ValueError(f"n_candidates must be >= 1, got {n_candidates}")
    params = lhs_param_dicts(n_candidates, random_state=random_state)
    rng = np.random.default_rng(random_state)
    n = len(y)
    order = rng.permutation(n)
    folds = np.array_split(order, cv)

    if vectorized:
        if backend != "jax":
            raise ValueError("vectorized grid search is the JAX GBT path; use backend='jax'")
        return _grid_search_cv_vectorized(X, y, params, folds, random_state, verbose, fits_per_call)

    cls = _classifier_cls(backend)
    best_score, best_params = -np.inf, None
    cap = max(p["n_estimators"] for p in params)
    for i, p in enumerate(params):
        scores = []
        for f in range(cv):
            te = folds[f]
            tr = np.concatenate([folds[g] for g in range(cv) if g != f])
            # fixed tree budget -> one compilation per depth for the sweep
            m = cls(**p, random_state=random_state, n_estimators_cap=cap)
            m.fit(X[tr], y[tr])
            scores.append(roc_auc_score(y[te], m.predict_proba(X[te])[:, 1]))
        s = float(np.mean(scores))
        if s > best_score:
            best_score, best_params = s, p
        if verbose and (i + 1) % 50 == 0:
            print(f"grid search {i + 1}/{len(params)}: best AUC {best_score:.4f}")
    if best_params is None:
        raise ValueError(
            "no candidate produced a finite CV score — dataset too small for "
            f"{cv}-fold CV (n={len(y)})"
        )
    return {"best_params": best_params, "best_score": best_score}


def _roc_auc_device(scores: "jnp.ndarray", labels: "jnp.ndarray", valid: "jnp.ndarray"):
    """Rank-statistic ROC-AUC of one padded score vector (device).

    Average ranks (tie-corrected, matching sklearn's roc_auc_score) via two
    searchsorteds against the sorted scores; padded entries carry +inf
    scores and zero weight so they sit past every real rank."""
    import jax.numpy as jnp

    scores = jnp.where(valid, scores, jnp.inf)
    w = valid.astype(jnp.float32)
    s_sorted = jnp.sort(scores)
    lo = jnp.searchsorted(s_sorted, scores, side="left")
    hi = jnp.searchsorted(s_sorted, scores, side="right")
    rank = (lo + hi + 1).astype(jnp.float32) / 2.0  # 1-based average rank
    pos = labels * w
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(w) - n_pos
    rank_sum = jnp.sum(rank * pos)
    return (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def _grid_search_cv_vectorized(X, y, params, folds, random_state, verbose, fits_per_call):
    import jax
    import jax.numpy as jnp

    from ae_waveforms_tpu.classify.gbt import (
        bin_data,
        compute_bin_edges,
        fit_gbt_sweep_margins,
    )

    X = np.asarray(X, np.float32)
    y_f = np.asarray(y, np.float32)
    n = len(y_f)
    cv = len(folds)
    cap = max(p["n_estimators"] for p in params)

    fold_masks = np.zeros((cv, n), np.float32)
    for f, te in enumerate(folds):
        fold_masks[f] = 1.0
        fold_masks[f, te] = 0.0  # held-out rows excluded from training

    # per-fold quantile bin edges from the TRAINING rows only (the reference's
    # GridSearchCV + XGBoost never sees held-out rows at fit time; full-pool
    # edges would leak held-out feature distributions into model selection).
    # Held-out rows are binned with their fold's training edges, exactly like
    # unseen data at predict time.
    bins_folds = np.zeros((cv, n, X.shape[1]), np.int32)
    for f in range(cv):
        tr_rows = fold_masks[f] > 0
        fold_edges = compute_bin_edges(X[tr_rows])
        bins_folds[f] = bin_data(X, fold_edges)

    # device-resident fold data: the bulk arrays cross the (possibly
    # tunnelled, ~minutes/MB) host->device link exactly once; each chunk
    # then ships only a handful of scalars per fit and pulls (S,) AUCs back
    fold_masks_dev = jnp.asarray(fold_masks)
    bins_folds_dev = jnp.asarray(bins_folds)
    y_dev = jnp.asarray(y_f)
    F = max(len(te) for te in folds)
    te_idx = np.zeros((cv, F), np.int32)
    te_valid = np.zeros((cv, F), bool)
    for f, te in enumerate(folds):
        te_idx[f, : len(te)] = te
        te_valid[f, : len(te)] = True
    te_idx_dev = jnp.asarray(te_idx)
    te_valid_dev = jnp.asarray(te_valid)

    @jax.jit
    def _fold_aucs(margins, fold_ids):
        """(S, n) margins + (S,) fold ids -> (S,) held-out ROC-AUCs."""

        def one(m, f):
            idx = te_idx_dev[f]
            return _roc_auc_device(m[idx], y_dev[idx], te_valid_dev[f])

        return jax.vmap(one)(margins, fold_ids)

    @functools.partial(jax.jit, static_argnames=("depth", "hist_impl"))
    def _run_chunk(packed, fold_id, depth, hist_impl=None):
        """One fused device program per chunk (fit + held-out AUC).
        Every fit in a chunk shares one CV fold, so the chunk's bin matrix
        (that fold's training-row quantile edges) stays unbatched and its
        one-hot indicator is traced once.  ``packed`` is the single (8, S)
        f32 upload carrying every per-fit scalar — each host->device put
        costs seconds through a tunnelled worker, so the chunk ships
        exactly one."""
        lr, gm, mc, sb, cl = packed[0], packed[1], packed[2], packed[3], packed[4]
        na = packed[5].astype(jnp.int32)
        dl = packed[6].astype(jnp.int32)
        seeds = packed[7].astype(jnp.uint32)
        rngs = jax.vmap(jax.random.PRNGKey)(seeds)
        S = packed.shape[1]
        row_w = jnp.broadcast_to(fold_masks_dev[fold_id], (S, n))
        bins_fold = bins_folds_dev[fold_id]
        # the boosting carry already holds every pool row's margin (held-out
        # rows route through the trees with zero gradient weight), so no
        # second tree traversal is needed for CV scoring
        _, margins = fit_gbt_sweep_margins(
            bins_fold, y_dev, row_w, rngs, lr, gm, mc, sb, cl, na,
            max_depth=depth, n_estimators=cap, depth_limits=dl,
            hist_impl=hist_impl,
        )
        return _fold_aucs(margins, jnp.broadcast_to(fold_id, (S,)))

    # group candidates into coarse depth buckets; depth itself is traced
    # (depth_limits), so each bucket compiles once regardless of the mix
    def bucket_of(d: int) -> int:
        return 6 if d <= 6 else 10

    by_depth: Dict[int, List[int]] = {}
    for i, p in enumerate(params):
        by_depth.setdefault(bucket_of(int(p["max_depth"])), []).append(i)

    fold_scores = np.zeros((len(params), cv))
    fold_done = np.zeros((len(params), cv), bool)
    done = 0

    # Per-bucket chunk size and histogram backend, measured on chip
    # (benchmarks/bench_gbt_mixed.py, v5e, production deep-bucket shape):
    # the deep (depth<=10) bucket's optimum is 24-fit chunks — XLA's
    # per-level A-operand HBM traffic scales with S, so the 96-fit optimum
    # tuned for the Pallas kernel is wrong there (0.990 -> 0.870 ms/tree/fit)
    # — and the mixed per-level backend (fused Pallas kernel on the 8
    # VMEM-feasible shallow levels, XLA on levels 8-9) takes it to 0.753:
    # a 1.31x faster deep bucket (~363 s -> ~276 s of the production grid).
    # The mixed kernel needs a real TPU; elsewhere the auto policy decides.
    def bucket_plan(depth: int) -> Tuple[int, Optional[str]]:
        if depth <= 6:
            return max(1, fits_per_call), None
        S = max(1, min(fits_per_call, 24))
        if jax.default_backend() == "tpu":
            from ae_waveforms_tpu.classify.gbt import N_BINS, _max_pallas_levels

            k = _max_pallas_levels(S, X.shape[1] * N_BINS, depth)
            if 0 < k < depth:
                return S, f"mixed:{k}"
        return S, None

    def dispatch(chunk, fold, depth, hist_impl):
        """Enqueue one chunk's fit + predict + held-out AUC; returns the
        (S,) device AUC vector without blocking (JAX async dispatch).  Per
        chunk only the traced hyperparameter scalars go up and S floats
        come back — the row weights and fold bins live on device."""
        S = len(chunk)
        packed = np.zeros((8, S), np.float32)
        for j, ci in enumerate(chunk):
            p = params[ci]
            packed[:, j] = (
                p["learning_rate"], p["gamma"], p["min_child_weight"],
                p["subsample"], p["colsample_bytree"], p["n_estimators"],
                p["max_depth"], random_state,
            )
        return _run_chunk(
            jnp.asarray(packed), jnp.asarray(fold, jnp.int32), depth, hist_impl
        )

    def score(chunk, fold, aucs_dev):
        nonlocal done
        aucs = np.asarray(aucs_dev)  # (S,) — blocks on the device queue
        for j, ci in enumerate(chunk):
            fold_scores[ci, fold] = aucs[j]
            fold_done[ci, fold] = True
        done += len(chunk)
        if verbose:
            # mean over COMPLETED folds only — unscored folds still hold 0.0
            # and would drag the printed best down to ~best/cv mid-run
            complete = fold_done.all(axis=1)
            if complete.any():
                best = fold_scores[complete].mean(axis=1).max()
                print(
                    f"grid search {done}/{len(params) * cv} fold-fits: "
                    f"best AUC {best:.4f}"
                )
            else:
                print(f"grid search {done}/{len(params) * cv} fold-fits")

    # one-chunk lookahead: while the device runs chunk k+1, the host pulls
    # chunk k's margins and scores its AUCs — host work and transfers hide
    # behind device execution instead of serialising with it
    pending = None
    for depth, idxs in sorted(by_depth.items()):
        bucket_fits, bucket_impl = bucket_plan(depth)
        for fold in range(cv):
            for c0 in range(0, len(idxs), bucket_fits):
                chunk = idxs[c0 : c0 + bucket_fits]
                aucs_dev = dispatch(chunk, fold, depth, bucket_impl)
                if pending is not None:
                    score(*pending)
                pending = (chunk, fold, aucs_dev)
    if pending is not None:
        score(*pending)

    mean_scores = fold_scores.mean(axis=1)
    best = int(np.argmax(mean_scores))
    return {"best_params": params[best], "best_score": float(mean_scores[best])}


def _fit_eval(data: ClassData, size: int, seed: int, best_params: Dict, drop_col: Optional[int],
              backend: str = "jax"):
    rng = np.random.default_rng(seed + 42)
    idx_c = rng.choice(len(data.control_train), size, replace=False)
    idx_s = rng.choice(len(data.sick_train), size, replace=False)
    X_train = np.concatenate([data.control_train[idx_c], data.sick_train[idx_s]], axis=0)
    y_train = np.concatenate([np.zeros(size), np.ones(size)])
    X_test = data.X_test
    if drop_col is not None:
        X_train = np.delete(X_train, drop_col, axis=1)
        X_test = np.delete(X_test, drop_col, axis=1)
    m = _classifier_cls(backend)(**best_params, random_state=seed + 42)
    m.fit(X_train, y_train)
    return m.predict_proba(X_test)[:, 1]


def _fit_eval_vectorized(
    data: ClassData, size: int, n_seeds: int, best_params: Dict, drop_col: Optional[int],
    mesh=None,
) -> np.ndarray:
    """All seeds of one size fitted in a single vmapped device program.

    Seed subsets become row-weight masks over the pooled train matrix;
    binning uses the pool's quantile edges (vs per-subset edges in the
    sequential path — an approximation-detail difference only).

    ``mesh``: shard the seed axis over the mesh's 'data' axis (the TPU
    counterpart of the reference's joblib ``n_jobs=-1`` fan-out,
    main_ae_classify.py:67-75); seeds pad to a mesh multiple with zero-weight
    rows, whose fits are inert and sliced off."""
    import jax

    from ae_waveforms_tpu.classify.gbt import (
        bin_data,
        compute_bin_edges,
        fit_gbt_multi,
        predict_margin_multi,
    )

    X_pool = np.concatenate([data.control_train, data.sick_train], axis=0).astype(np.float32)
    y_pool = np.concatenate(
        [np.zeros(len(data.control_train)), np.ones(len(data.sick_train))]
    ).astype(np.float32)
    X_test = data.X_test
    if drop_col is not None:
        X_pool = np.delete(X_pool, drop_col, axis=1)
        X_test = np.delete(X_test, drop_col, axis=1)

    n_c = len(data.control_train)
    weights = np.zeros((n_seeds, len(y_pool)), np.float32)
    for seed in range(n_seeds):
        rng = np.random.default_rng(seed + 42)
        weights[seed, rng.choice(n_c, size, replace=False)] = 1.0
        weights[seed, n_c + rng.choice(len(data.sick_train), size, replace=False)] = 1.0

    edges = compute_bin_edges(X_pool)
    bins_pool = bin_data(X_pool, edges)
    bins_test = bin_data(np.asarray(X_test, np.float32), edges)
    n_fit = n_seeds
    rngs = jax.vmap(jax.random.PRNGKey)(np.arange(n_seeds) + 42)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        n_fit = ((n_seeds + n_data - 1) // n_data) * n_data
        if n_fit != n_seeds:
            weights = np.concatenate(
                [weights, np.zeros((n_fit - n_seeds, weights.shape[1]), np.float32)]
            )
            rngs = jax.vmap(jax.random.PRNGKey)(np.arange(n_fit) + 42)
        seed_sharding = NamedSharding(mesh, P("data", None))
        weights = jax.device_put(np.asarray(weights), seed_sharding)
        rngs = jax.device_put(np.asarray(rngs), seed_sharding)
        bins_pool = jax.device_put(np.asarray(bins_pool), NamedSharding(mesh, P()))
        bins_test = jax.device_put(np.asarray(bins_test), NamedSharding(mesh, P()))

    p = best_params
    ens = fit_gbt_multi(
        bins_pool, y_pool, weights, rngs,
        max_depth=int(p["max_depth"]), n_estimators=int(p["n_estimators"]),
        learning_rate=float(p["learning_rate"]), gamma=float(p["gamma"]),
        min_child_weight=float(p["min_child_weight"]), subsample=float(p["subsample"]),
        colsample_bytree=float(p["colsample_bytree"]),
        # the fused Pallas histogram kernel is a single-device program (no
        # GSPMD partitioning rule); the seed-sharded multi-chip path keeps
        # the XLA histograms, which partition trivially over the seed axis
        hist_impl="xla" if mesh is not None else None,
    )
    margins = np.asarray(predict_margin_multi(ens, bins_test, int(p["max_depth"])))[:n_seeds]
    return 1.0 / (1.0 + np.exp(-margins))  # (S, n_test)


def size_seed_sweep(
    data: ClassData,
    best_params: Dict,
    sizes: Sequence[int] = tuple(DEFAULT_SIZES),
    n_seeds: int = 25,
    drop_col: Optional[int] = None,
    out_dir: Optional[str] = None,
    file_stem: str = "",
    vectorized: bool = False,
    mesh=None,
    backend: str = "jax",
) -> Tuple[List[Dict], List[Dict]]:
    """AUC-vs-training-size evaluation; writes individual_aucs.csv and
    summary_auc_by_size.csv plus the AUC-vs-size plot when out_dir given.
    ``vectorized=True`` fits all seeds of a size in one device program;
    ``mesh`` additionally shards the seed axis over the mesh's 'data' axis."""
    auc_records, summary_records = [], []
    for size in sizes:
        size = min(size, len(data.control_train), len(data.sick_train))
        aucs = []
        if vectorized:
            probas = _fit_eval_vectorized(data, size, n_seeds, best_params, drop_col, mesh=mesh)
            for seed in range(n_seeds):
                auc = roc_auc_score(data.y_test, probas[seed])
                aucs.append(auc)
                auc_records.append({"size": size, "seed": seed, "auc": auc})
        else:
            for seed in range(n_seeds):
                proba = _fit_eval(data, size, seed, best_params, drop_col, backend=backend)
                auc = roc_auc_score(data.y_test, proba)
                aucs.append(auc)
                auc_records.append({"size": size, "seed": seed, "auc": auc})
        summary_records.append(
            {
                "size": size,
                "median_auc": float(np.median(aucs)),
                "q1_auc": float(np.percentile(aucs, 25)),
                "q3_auc": float(np.percentile(aucs, 75)),
            }
        )
        print(
            f"Size: {size}, Median AUC: {summary_records[-1]['median_auc']:.4f}, "
            f"IQR: ({summary_records[-1]['q1_auc']:.4f}, {summary_records[-1]['q3_auc']:.4f})"
        )

    if out_dir is not None:
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)
        prefix = f"{file_stem}_" if file_stem else ""
        pd.DataFrame(auc_records).to_csv(os.path.join(out_dir, f"{prefix}individual_aucs.csv"), index=False)
        pd.DataFrame(summary_records).to_csv(
            os.path.join(out_dir, f"{prefix}summary_auc_by_size.csv"), index=False
        )
        _plot_auc_vs_size(summary_records, os.path.join(out_dir, f"{prefix}auc_vs_data_size.png"))
    return auc_records, summary_records


def ppv_analysis(
    data: ClassData,
    best_params: Dict,
    size: int = 6000,
    n_seeds: int = 25,
    threshold: float = 0.5,
    vectorized: bool = False,
    mesh=None,
    backend: str = "jax",
) -> Dict:
    """Median/IQR AUC and PPV at the given threshold for one training size —
    the north-star hypokalaemia PPV metric (analysis_PPV_hypokalaemia.py).
    ``vectorized=True`` fits all seeds in one vmapped device program;
    ``mesh`` shards the seed axis over the mesh's 'data' axis."""
    size = min(size, len(data.control_train), len(data.sick_train))
    aucs, ppvs = [], []
    if vectorized:
        probas = _fit_eval_vectorized(data, size, n_seeds, best_params, None, mesh=mesh)
        seed_probas = [probas[s] for s in range(n_seeds)]
    else:
        seed_probas = [
            _fit_eval(data, size, seed, best_params, None, backend=backend)
            for seed in range(n_seeds)
        ]
    for proba in seed_probas:
        aucs.append(roc_auc_score(data.y_test, proba))
        ppvs.append(precision_score(data.y_test, (proba >= threshold).astype(int)))
    result = {
        "size": size,
        "median_auc": float(np.median(aucs)),
        "q1_auc": float(np.percentile(aucs, 25)),
        "q3_auc": float(np.percentile(aucs, 75)),
        "median_ppv": float(np.median(ppvs)),
        "q1_ppv": float(np.percentile(ppvs, 25)),
        "q3_ppv": float(np.percentile(ppvs, 75)),
        "aucs": aucs,
        "ppvs": ppvs,
    }
    print(f"Size: {size}")
    print(f"Median AUC: {result['median_auc']:.4f}, IQR: ({result['q1_auc']:.4f}, {result['q3_auc']:.4f})")
    print(
        f"Median PPV @ threshold {threshold}: {result['median_ppv']:.4f}, "
        f"IQR: ({result['q1_ppv']:.4f}, {result['q3_ppv']:.4f})"
    )
    return result


def evaluate_combined_model_auc(X: np.ndarray, y: np.ndarray, best_params: Dict, seed: int) -> float:
    """AUC of a combined-feature model on a stratified 80/20 split
    (main_ml_classify.py:66-75 capability)."""
    from sklearn.model_selection import train_test_split

    Xtr, Xva, ytr, yva = train_test_split(X, y, test_size=0.2, random_state=seed, stratify=y)
    m = GBTClassifier(**best_params, random_state=seed)
    m.fit(Xtr, ytr)
    return float(roc_auc_score(yva, m.predict_proba(Xva)[:, 1]))


def plot_individual_feature_rocs(
    X_train: np.ndarray,
    X_val: np.ndarray,
    y_train: np.ndarray,
    y_val: np.ndarray,
    best_params: Dict,
    feature_names: Optional[Sequence[str]] = None,
    out_path: Optional[str] = None,
) -> Dict[str, float]:
    """Per-feature single-variable ROC curves plus the combined model
    (main_ml_classify.py:16-64 capability).  Returns {label: AUC}."""
    from sklearn.metrics import roc_curve

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if feature_names is None:
        feature_names = [
            "P Duration", "PR Interval", "QRS Complex", "ST Interval", "ST Segment",
            "P Prominence", "Q Prominence", "R Prominence", "S Prominence", "T Prominence",
        ]
    aucs: Dict[str, float] = {}
    plt.figure(figsize=(8, 6))
    for i in range(X_train.shape[1]):
        m = GBTClassifier(**best_params, random_state=1)
        m.fit(X_train[:, i : i + 1], y_train)
        proba = m.predict_proba(X_val[:, i : i + 1])[:, 1]
        fpr, tpr, _ = roc_curve(y_val, proba)
        label = feature_names[i] if i < len(feature_names) else f"Feature {i + 1}"
        aucs[label] = float(roc_auc_score(y_val, proba))
        plt.plot(fpr, tpr, lw=1, label=f"{label} (AUC = {aucs[label]:.2f})")

    full = GBTClassifier(**best_params, random_state=1)
    full.fit(X_train, y_train)
    proba = full.predict_proba(X_val)[:, 1]
    fpr, tpr, _ = roc_curve(y_val, proba)
    aucs["Combined"] = float(roc_auc_score(y_val, proba))
    plt.plot(fpr, tpr, color="black", lw=2, label=f"Combined Model (AUC = {aucs['Combined']:.2f})")
    plt.plot([0, 1], [0, 1], color="gray", linestyle="--")
    plt.xlabel("False Positive Rate")
    plt.ylabel("True Positive Rate")
    plt.legend(loc="lower right", fontsize=8)
    plt.grid(True)
    plt.tight_layout()
    if out_path:
        plt.savefig(out_path, dpi=200)
    plt.close()
    return aucs


def _plot_auc_vs_size(summary: List[Dict], out_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sizes = np.array([r["size"] for r in summary])
    med = np.array([r["median_auc"] for r in summary])
    q1 = np.array([r["q1_auc"] for r in summary])
    q3 = np.array([r["q3_auc"] for r in summary])
    plt.figure(figsize=(8, 6))
    plt.plot(sizes, med, "-o", label="Median AUC")
    plt.fill_between(sizes, q1, q3, alpha=0.2, label="IQR (25th-75th percentile)")
    ref = med[-1]
    for frac, color in [(1.0, "black"), (0.975, "gray"), (0.95, "lightgray")]:
        plt.axhline(frac * ref, color=color, linestyle="--", linewidth=1.5, label=f"{frac:.1%} of Max AUC")
    plt.xlabel("Number of Patients per Class")
    plt.ylabel("ROC AUC on Fixed Test Set")
    plt.grid(True)
    plt.xticks(sizes, rotation=45)
    plt.legend(loc="lower right")
    plt.tight_layout()
    plt.savefig(out_path, dpi=300)
    plt.close()
