"""Batched scoring service."""

import numpy as np

from ae_waveforms_tpu.classify.gbt import GBTClassifier
from ae_waveforms_tpu.serve import Scorer


def test_scorer_end_to_end(tmp_path):
    import jax

    from ae_waveforms_tpu.models import conv_ae

    params = conv_ae.init(jax.random.PRNGKey(0), 6)
    scorer = Scorer(params=params, model_class="LeNet5AutoencoderAvgPool")

    rng = np.random.default_rng(0)
    waves = rng.standard_normal((10, 320)).astype(np.float32)
    out = scorer.score(waves)
    assert out["reconstruction"].shape == (10, 320)
    assert out["latents"].shape == (10, 6)
    assert out["rmse"].shape == (10,) and np.all(out["rmse"] > 0)

    # attach a classifier head trained on the latents
    z = out["latents"]
    y = (z[:, 0] > np.median(z[:, 0])).astype(float)
    gbt = GBTClassifier(max_depth=2, n_estimators=10, random_state=0).fit(z, y)
    out2 = scorer.attach_gbt(gbt).score(waves)
    assert out2["probability"].shape == (10,)
    assert np.all((out2["probability"] >= 0) & (out2["probability"] <= 1))


def test_scorer_from_run(tmp_path):
    from ae_waveforms_tpu.core.config import TrainConfig
    from ae_waveforms_tpu.core.schema import save_arrays
    from ae_waveforms_tpu.train.loop import main_train
    from tests.test_train import _toy_arrays

    arrays = _toy_arrays(n=120, n_cases=20)
    ddir = str(tmp_path / "data")
    save_arrays(arrays, ddir)
    cfg = TrainConfig(
        dataset_dir=ddir, results_dir=str(tmp_path / "res"),
        model_class="LeNet5AutoencoderAvgPool", latent_size=4, batch_size=16,
        epochs=1, validation_interval=2, split_size_val=0.25, split_size_test=0.25,
        seed=1, plotting=False,
    )
    run_dir = main_train(cfg, arrays=arrays, max_steps=4)
    import os

    scorer = Scorer.from_run(cfg.results_dir, os.path.basename(run_dir), cfg)
    out = scorer.score(arrays.waves[:8])
    assert out["latents"].shape == (8, 4)


def test_scorer_bucketing_consistent():
    """Different request sizes share compiled buckets and return trimmed,
    size-correct results."""
    import jax

    from ae_waveforms_tpu.models import conv_ae

    params = conv_ae.init(jax.random.PRNGKey(1), 4)
    scorer = Scorer(params=params, model_class="LeNet5AutoencoderAvgPool")
    rng = np.random.default_rng(1)
    w = rng.standard_normal((70, 320)).astype(np.float32)
    a = scorer.score(w[:5], bucket=16)
    b = scorer.score(w, bucket=16)
    assert a["latents"].shape == (5, 4) and b["latents"].shape == (70, 4)
    np.testing.assert_allclose(a["latents"], b["latents"][:5], atol=1e-6)


def test_mimic_adapter_gates_cleanly():
    from ae_waveforms_tpu.data.mimic_io import have_wfdb, make_mimic_loader

    if have_wfdb():
        return  # environment has the client; loader construction succeeds
    import pytest

    with pytest.raises(RuntimeError):
        make_mimic_loader(["/nonexistent"])
