"""Small capability twins: QC extras, dataset view, regex splits, ROC
helpers, plotting hooks."""

import numpy as np

from ae_waveforms_tpu.signals.qc_extras import autocorrelation, calculate_entropy, sd_filter


def test_sd_filter():
    x = np.ones((3, 100))
    x[1] *= 100
    x[1, ::2] = -100
    assert sd_filter(x, threshold=39) == {1}


def test_entropy_and_autocorr():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(1000)
    h = calculate_entropy(sig)
    assert 0 < h < 10
    ac = autocorrelation(np.sin(np.linspace(0, 20 * np.pi, 1000)))
    assert abs(ac[0] - 1.0) < 1e-9
    assert len(ac) == 1000


def test_wave_dataset_view():
    from ae_waveforms_tpu.train.data import WaveDataset

    waves = np.random.default_rng(0).standard_normal((10, 320)).astype(np.float32)
    feats = np.random.default_rng(1).standard_normal((10, 35))
    info = np.stack([np.repeat([1, 2], 5), np.arange(10)], axis=1).astype(float)
    flag = info[:, 0] == 1
    ds = WaveDataset(waves, feats, info, flag=flag, channel_first=False)
    assert len(ds) == 5
    x, y, f, c = ds[0]
    assert x.shape == (320, 1)
    np.testing.assert_array_equal(x, y)
    demo = ds.get_patient_demographics()
    assert len(demo) == 1


def test_regex_split_rule(tmp_path):
    from ae_waveforms_tpu.train.data import split_datasets

    np.random.seed(0)
    info = np.stack([np.repeat(np.arange(10, 30), 4), np.zeros(80)], axis=1).astype(float)
    tr, va, te = split_datasets(info, str(tmp_path), regex_rule=r"1[0-9]\.")
    # only ids 10-19 survive the regex
    kept = tr | va | te
    assert set(info[kept][:, 0]) <= set(range(10, 20))


def test_individual_feature_rocs(tmp_path):
    from ae_waveforms_tpu.classify.harness import evaluate_combined_model_auc, plot_individual_feature_rocs

    rng = np.random.default_rng(0)
    X = rng.standard_normal((300, 4)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.standard_normal(300) > 0).astype(float)
    params = dict(max_depth=3, learning_rate=0.2, n_estimators=40, gamma=0.0,
                  min_child_weight=1, subsample=1.0, colsample_bytree=1.0)
    aucs = plot_individual_feature_rocs(
        X[:200], X[200:], y[:200], y[200:], params,
        feature_names=["a", "b", "c", "d"], out_path=str(tmp_path / "roc.png"),
    )
    assert aucs["Combined"] > aucs["c"]  # informative features beat noise
    assert (tmp_path / "roc.png").exists()
    auc = evaluate_combined_model_auc(X, y, params, seed=1)
    assert auc > 0.7


def test_qc_grid_plot(tmp_path):
    from ae_waveforms_tpu.analysis.plots import plot_fiducials, plot_qc_grid

    rng = np.random.default_rng(0)
    samples = rng.standard_normal((8, 500))
    peak_lists = [[50, 200, 400]] * 8
    metric = rng.uniform(0, 1, 8)
    out = plot_qc_grid(samples, peak_lists, metric, "sd/hr", str(tmp_path / "grid.png"), n_panels=8)
    assert (tmp_path / "grid.png").exists()
    out2 = plot_fiducials(samples[0], {"ECG_T_Peaks": [100, np.nan, 300]}, str(tmp_path / "fid.png"))
    assert (tmp_path / "fid.png").exists()


def test_handcrafted_feature_export():
    from ae_waveforms_tpu.classify.feature_export import HANDCRAFTED_COLUMNS, export_handcrafted_features

    assert HANDCRAFTED_COLUMNS == [20, 25, 26, 27, 28, 24, 30, 31, 32, 33, 34]
    feats = np.arange(6 * 35).reshape(6, 35).astype(float)
    info = np.stack([np.array([1, 1, 2, 2, 3, 3]), np.zeros(6)], axis=1)
    out = export_handcrafted_features(feats, info, np.array([1, 3]), cap=3)
    assert out.shape == (3, 11)
    np.testing.assert_array_equal(out[0], feats[0][HANDCRAFTED_COLUMNS])


def test_load_env_file(tmp_path, monkeypatch):
    import os

    from ae_waveforms_tpu.core.config import load_env_file

    p = tmp_path / "vars.env"
    p.write_text("DATA_FOLDER_PATH=/some/path\n# comment\nNPT_PROJECT=me/proj\n")
    monkeypatch.delenv("NPT_PROJECT", raising=False)
    vals = load_env_file(str(p))
    assert vals["DATA_FOLDER_PATH"] == "/some/path"
    assert os.environ["NPT_PROJECT"] == "me/proj"


def test_split_cache_reuse(tmp_path):
    """Split masks cached in the dataset dir are reused on later runs even
    under a different RNG state (load_data.py:113-131 behaviour)."""
    from ae_waveforms_tpu.train.data import split_datasets

    info = np.stack([np.repeat(np.arange(30), 4), np.zeros(120)], axis=1).astype(float)
    np.random.seed(1)
    tr1, va1, te1 = split_datasets(info, str(tmp_path))
    np.random.seed(999)  # different state: cached masks must win
    tr2, va2, te2 = split_datasets(info, str(tmp_path))
    np.testing.assert_array_equal(tr1, tr2)
    np.testing.assert_array_equal(va1, va2)
    np.testing.assert_array_equal(te1, te2)


def test_split_nr_train_ids_subsample(tmp_path):
    from ae_waveforms_tpu.train.data import split_datasets

    info = np.stack([np.repeat(np.arange(40), 3), np.zeros(120)], axis=1).astype(float)
    np.random.seed(2)
    tr_full, _, _ = split_datasets(info, str(tmp_path / "a"))
    np.random.seed(2)
    tr_sub, _, _ = split_datasets(info, str(tmp_path / "b"), nr_train_ids=5)
    # the subsample restricts training rows to at most 5 case ids
    assert len(np.unique(info[tr_sub][:, 0])) <= 5
    assert tr_sub.sum() <= tr_full.sum()
