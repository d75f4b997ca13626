"""Vmapped multi-seed DL classifier training."""

import numpy as np


def _cohorts(n=60, seed=0, length=96):
    # short sequences: the harness is length-agnostic and the LSTM scans
    # dominate test runtime
    rng = np.random.default_rng(seed)
    t = np.linspace(-1, 2, length)
    base = np.exp(-(t**2) / 0.02)
    control = base[None, :] + 0.05 * rng.standard_normal((n, length))
    sick = 1.6 * base[None, :] + 0.05 * rng.standard_normal((n, length))
    return control.astype(np.float32), sick.astype(np.float32)


def test_vectorized_sweep_matches_quality():
    from ae_waveforms_tpu.classify.dl import dl_size_seed_sweep

    control, sick = _cohorts()
    kw = dict(sizes=[20], n_seeds=2, num_epochs=2, test_size=20)
    seq = dl_size_seed_sweep(control, sick, **kw)
    vec = dl_size_seed_sweep(control, sick, vectorized=True, **kw)
    assert vec[0]["median_auc"] > 0.6
    # same data selection per seed; training RNG streams differ by design
    assert abs(seq[0]["median_auc"] - vec[0]["median_auc"]) < 0.25


def test_train_classifier_multi_shapes():
    from ae_waveforms_tpu.classify.dl import train_classifier_multi

    rng = np.random.default_rng(1)
    S, n, m = 3, 32, 12
    Xs = rng.standard_normal((S, n, 64, 1)).astype(np.float32)
    ys = (rng.uniform(size=(S, n)) > 0.5).astype(np.float32)
    Xvs = rng.standard_normal((S, m, 64, 1)).astype(np.float32)
    yvs = np.tile([0.0, 1.0], (S, m // 2))
    models = train_classifier_multi(Xs, ys, Xvs, yvs, seeds=[0, 1, 2], num_epochs=2, batch_size=16)
    assert len(models) == 3
    p0, s0 = models[0]
    assert p0["fc2"]["w"].shape == (1, 32)
