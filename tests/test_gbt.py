"""JAX histogram GBDT: accuracy vs sklearn's gradient boosting and basic
hyperparameter behaviours."""

import numpy as np
import pytest
from sklearn.datasets import make_classification
from sklearn.ensemble import HistGradientBoostingClassifier
from sklearn.metrics import roc_auc_score
from sklearn.model_selection import train_test_split

from ae_waveforms_tpu.classify.gbt import GBTClassifier


def _task(n=3000, f=10, seed=0, sep=0.8):
    X, y = make_classification(
        n_samples=n, n_features=f, n_informative=6, n_redundant=2, class_sep=sep, random_state=seed
    )
    return train_test_split(X.astype(np.float32), y, test_size=0.3, random_state=seed, stratify=y)


def test_auc_competitive_with_sklearn():
    Xtr, Xte, ytr, yte = _task()
    ours = GBTClassifier(max_depth=4, n_estimators=150, learning_rate=0.1, random_state=0)
    ours.fit(Xtr, ytr)
    auc_ours = roc_auc_score(yte, ours.predict_proba(Xte)[:, 1])

    ref = HistGradientBoostingClassifier(max_depth=4, max_iter=150, learning_rate=0.1, random_state=0)
    ref.fit(Xtr, ytr)
    auc_ref = roc_auc_score(yte, ref.predict_proba(Xte)[:, 1])

    assert auc_ours > 0.9
    assert auc_ours > auc_ref - 0.02, (auc_ours, auc_ref)


def test_overfits_train_with_depth():
    Xtr, Xte, ytr, yte = _task(n=800)
    m = GBTClassifier(max_depth=6, n_estimators=200, learning_rate=0.3, random_state=1)
    m.fit(Xtr, ytr)
    train_auc = roc_auc_score(ytr, m.predict_proba(Xtr)[:, 1])
    assert train_auc > 0.995


def test_gamma_regularises():
    Xtr, Xte, ytr, yte = _task(n=1200, sep=0.5)
    deep = GBTClassifier(max_depth=6, n_estimators=50, learning_rate=0.3, gamma=0.0, random_state=2)
    reg = GBTClassifier(max_depth=6, n_estimators=50, learning_rate=0.3, gamma=10.0, random_state=2)
    deep.fit(Xtr, ytr)
    reg.fit(Xtr, ytr)
    # a large gamma must prune splits -> fewer split nodes
    assert int(np.asarray(reg._ens.is_split).sum()) < int(np.asarray(deep._ens.is_split).sum())


def test_subsample_and_colsample_run():
    Xtr, Xte, ytr, yte = _task(n=1000)
    m = GBTClassifier(
        max_depth=3, n_estimators=80, learning_rate=0.2, subsample=0.7, colsample_bytree=0.6, random_state=3
    )
    m.fit(Xtr, ytr)
    auc = roc_auc_score(yte, m.predict_proba(Xte)[:, 1])
    assert auc > 0.85


def test_sample_weight_mask_restricts_training():
    """A weight mask selecting one class only must yield a degenerate model."""
    Xtr, Xte, ytr, yte = _task(n=1000)
    w = (ytr == 1).astype(np.float32)
    m = GBTClassifier(max_depth=3, n_estimators=20, random_state=4)
    m.fit(Xtr, ytr, sample_weight=w)
    p = m.predict_proba(Xte)[:, 1]
    assert p.min() > 0.5  # only positive examples seen


def test_estimator_cap_masks_extra_trees():
    """A capped fit with n_active == requested trees must match the exact
    fit with the same tree count, and extra trees must be inert."""
    import jax
    import jax.numpy as jnp

    from ae_waveforms_tpu.classify.gbt import bin_data, compute_bin_edges, fit_gbt, predict_margin

    Xtr, Xte, ytr, yte = _task(n=400)
    edges = compute_bin_edges(Xtr)
    bins = bin_data(Xtr, edges)
    w = np.ones(len(ytr), np.float32)
    kw = dict(max_depth=3, learning_rate=0.2)

    exact = fit_gbt(bins, jnp.asarray(ytr, jnp.float32), w, jax.random.PRNGKey(0),
                    n_estimators=40, **kw)
    capped = fit_gbt(bins, jnp.asarray(ytr, jnp.float32), w, jax.random.PRNGKey(0),
                     n_estimators=100, n_active=40, **kw)
    m_exact = np.asarray(predict_margin(exact, bins, 3))
    m_capped = np.asarray(predict_margin(capped, bins, 3))
    np.testing.assert_allclose(m_capped, m_exact, atol=1e-5)


def test_depth_limit_matches_native_depth():
    """A depth-limited fit inside a deeper program is exactly the native
    shallower fit (identical partitions and leaf values)."""
    import jax
    import jax.numpy as jnp

    from ae_waveforms_tpu.classify.gbt import bin_data, compute_bin_edges, fit_gbt, predict_margin

    Xtr, Xte, ytr, yte = _task(n=400)
    edges = compute_bin_edges(Xtr)
    bins = bin_data(Xtr, edges)
    w = np.ones(len(ytr), np.float32)
    kw = dict(n_estimators=30, learning_rate=0.2)

    native = fit_gbt(bins, jnp.asarray(ytr, jnp.float32), w, jax.random.PRNGKey(0), max_depth=3, **kw)
    masked = fit_gbt(bins, jnp.asarray(ytr, jnp.float32), w, jax.random.PRNGKey(0),
                     max_depth=6, depth_limit=3, **kw)
    m_native = np.asarray(predict_margin(native, bins, 3))
    m_masked = np.asarray(predict_margin(masked, bins, 6))
    np.testing.assert_allclose(m_masked, m_native, atol=1e-5)


def test_sklearn_backend_through_harness():
    """The A/B oracle backend (classify/sklearn_gbt.py) runs through the
    same harness procedure and reaches comparable task quality."""
    from ae_waveforms_tpu.classify.harness import (
        grid_search_cv, ppv_analysis, prepare_class_data,
    )

    rng = np.random.default_rng(5)
    control = rng.standard_normal((260, 6)).astype(np.float32)
    sick = (rng.standard_normal((260, 6)) + 1.2).astype(np.float32)
    data = prepare_class_data(control, sick, test_size=60)
    X = np.concatenate([data.control_train, data.sick_train])
    y = np.concatenate([np.zeros(len(data.control_train)), np.ones(len(data.sick_train))])

    gs = grid_search_cv(X, y, n_candidates=3, cv=3, backend="sklearn")
    assert gs["best_score"] > 0.8
    res = ppv_analysis(data, gs["best_params"], size=100, n_seeds=3, backend="sklearn")
    assert res["median_ppv"] > 0.6
