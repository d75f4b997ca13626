"""Classification harness tests: id selection, grid search, size x seed
sweep, PPV analysis and the DL classifier loop — on small synthetic data."""

import numpy as np

from ae_waveforms_tpu.classify.harness import (
    grid_search_cv,
    ppv_analysis,
    prepare_class_data,
    select_by_ids,
    size_seed_sweep,
)


def _toy_latents(n_per_class=400, d=10, seed=0, sep=1.2):
    rng = np.random.default_rng(seed)
    control = rng.standard_normal((n_per_class, d)).astype(np.float32)
    sick = (rng.standard_normal((n_per_class, d)) + sep * rng.uniform(0.2, 1.0, d)).astype(np.float32)
    return control, sick


def test_prepare_class_data_fixed_tail_test():
    control, sick = _toy_latents(300)
    data = prepare_class_data(control, sick, cap=6500, test_size=250)
    assert len(data.X_test) == 500
    np.testing.assert_array_equal(data.X_test[:250], control[-250:])
    np.testing.assert_array_equal(data.X_test[250:], sick[-250:])
    assert len(data.control_train) == 50 and len(data.sick_train) == 50


def test_select_by_ids():
    ids = np.array([10, 10, 11, 12, 12, 13])
    feats = np.arange(6)[:, None]
    out = select_by_ids(ids, feats, np.array([10, 12]))
    np.testing.assert_array_equal(out[:, 0], [0, 1, 3, 4])


def test_grid_search_and_sweep_and_ppv():
    control, sick = _toy_latents(400, sep=1.5)
    data = prepare_class_data(control, sick, test_size=100)
    X = np.concatenate([data.control_train, data.sick_train])
    y = np.concatenate([np.zeros(len(data.control_train)), np.ones(len(data.sick_train))])

    gs = grid_search_cv(X, y, n_candidates=4, cv=3, random_state=1)
    assert 0.5 < gs["best_score"] <= 1.0
    assert set(gs["best_params"]) == {
        "max_depth", "learning_rate", "n_estimators", "gamma",
        "min_child_weight", "subsample", "colsample_bytree",
    }

    auc_records, summary = size_seed_sweep(
        data, gs["best_params"], sizes=[50, 100], n_seeds=3
    )
    assert len(auc_records) == 6
    assert all(0.5 < r["median_auc"] <= 1.0 for r in summary)
    # separable classes -> strong AUC
    assert summary[-1]["median_auc"] > 0.85

    ppv = ppv_analysis(data, gs["best_params"], size=100, n_seeds=3)
    assert 0.5 < ppv["median_ppv"] <= 1.0


def test_drop_column_variant():
    """main_ml_classify deletes feature column 5 before fitting."""
    control, sick = _toy_latents(200, d=10)
    data = prepare_class_data(control, sick, test_size=50)
    params = dict(max_depth=3, learning_rate=0.2, n_estimators=30, gamma=0.0,
                  min_child_weight=1, subsample=1.0, colsample_bytree=1.0)
    _, summary = size_seed_sweep(data, params, sizes=[50], n_seeds=2, drop_col=5)
    assert summary[0]["median_auc"] > 0.5


def test_dl_classifier_smoke():
    from ae_waveforms_tpu.classify.dl import dl_size_seed_sweep

    rng = np.random.default_rng(0)
    t = np.linspace(-1, 2, 96)  # short sequences keep the LSTM scans fast
    base = np.exp(-(t**2) / 0.02)
    control = base[None, :] + 0.05 * rng.standard_normal((80, 96))
    sick = 1.5 * base[None, :] + 0.05 * rng.standard_normal((80, 96))
    summary = dl_size_seed_sweep(
        control.astype(np.float32), sick.astype(np.float32),
        sizes=[24], n_seeds=2, num_epochs=3, test_size=30,
    )
    assert len(summary) == 1
    assert summary[0]["median_auc"] > 0.6  # separable amplitudes
