"""Full offline end-to-end slice: extract -> train -> test -> analysis ->
classify (SURVEY §7's minimum end-to-end milestone)."""

import glob
import os
import shutil

import numpy as np

from ae_waveforms_tpu.cli.extract import main as extract_main
from ae_waveforms_tpu.core.config import TrainConfig


def test_end_to_end_slice(tmp_path):
    data_dir = str(tmp_path / "data")
    results_dir = str(tmp_path / "results")

    extract_main(["--out", data_dir, "--cases", "8", "--duration", "90"])
    assert os.path.isfile(os.path.join(data_dir, "np_waves.npy"))
    waves = np.load(os.path.join(data_dir, "np_waves.npy"))
    assert waves.shape[1] == 320 and len(waves) >= 8

    cfg = TrainConfig(
        dataset_dir=data_dir,
        results_dir=results_dir,
        model_class="LeNet5AutoencoderAvgPool",
        latent_size=6,
        batch_size=8,
        epochs=1,
        validation_interval=2,
        split_size_val=0.25,
        split_size_test=0.25,
        seed=4,
        plotting=False,
    )
    from ae_waveforms_tpu.train.loop import main_train

    run_dir = main_train(cfg, max_steps=6)
    run_name = os.path.basename(run_dir)

    from ae_waveforms_tpu.train.eval import main_test

    _, (loss, rmse, _, prd, _), (pred, true, info), latents = main_test(
        cfg.replace(mode="test", trained_model=run_name)
    )
    assert np.isfinite(rmse) and latents.shape[1] == 6

    for f in glob.glob(os.path.join(run_dir, "indices_test_*.npy")):
        shutil.copy(f, data_dir)
    from ae_waveforms_tpu.analysis.trad_vs_ae import compare

    results = compare(cfg, run_sigma_search=True, search_candidates=16)
    assert "traditional" in results
    assert np.isfinite(results["traditional"].mse)

    # classify on the exported latents
    from ae_waveforms_tpu.classify.harness import ppv_analysis, prepare_class_data

    rng = np.random.default_rng(0)
    control = latents + 0.05 * rng.standard_normal(latents.shape)
    sick = latents + 1.0 + 0.05 * rng.standard_normal(latents.shape)
    data = prepare_class_data(control, sick, test_size=max(2, len(latents) // 4))
    params = dict(max_depth=3, learning_rate=0.2, n_estimators=20, gamma=0.0,
                  min_child_weight=1, subsample=1.0, colsample_bytree=1.0)
    out = ppv_analysis(data, params, size=min(8, len(data.control_train)), n_seeds=2)
    assert out["median_ppv"] > 0.8  # well-separated synthetic cohorts


def test_resume_and_serve_in_flow(tmp_path):
    """Kill-and-resume mid-train plus the serving surface, in one flow:
    train a few steps, resume from the saved full train state (params +
    optimizer + PRNG + step), then score through serve.Scorer with a GBT
    head attached (beyond-reference capabilities, SURVEY §5.4)."""
    data_dir = str(tmp_path / "data")
    results_dir = str(tmp_path / "results")
    extract_main(["--out", data_dir, "--cases", "8", "--duration", "90"])

    cfg = TrainConfig(
        dataset_dir=data_dir,
        results_dir=results_dir,
        model_class="LeNet5AutoencoderAvgPool",
        latent_size=6,
        batch_size=8,
        epochs=2,
        validation_interval=2,
        split_size_val=0.25,
        split_size_test=0.25,
        seed=4,
        plotting=False,
    )
    from ae_waveforms_tpu.train.loop import main_train

    # "crash" after a few steps; the run dir holds a resumable checkpoint
    run_dir = main_train(cfg, max_steps=4)
    import glob as _glob

    assert _glob.glob(os.path.join(run_dir, "resumable_*.npz")) or _glob.glob(
        os.path.join(run_dir, "*.npz")
    )

    # resume: continues from the restored step instead of starting over
    resumed_dir = main_train(cfg, max_steps=8, resume_dir=run_dir)
    log = open(os.path.join(resumed_dir, "console.log")).read()
    import re
    m = re.search(r"Resumed full train state .* at step (\d+)", log)
    assert m and int(m.group(1)) > 0

    # serving surface on the resumed model, with a classifier head
    from ae_waveforms_tpu.classify.gbt import GBTClassifier
    from ae_waveforms_tpu.serve import Scorer

    waves = np.load(os.path.join(data_dir, "np_waves.npy")).astype(np.float32)
    scorer = Scorer.from_run(
        results_dir, os.path.basename(resumed_dir), cfg.replace(trained_model=os.path.basename(resumed_dir))
    )
    out = scorer.score(waves[:10])
    assert out["latents"].shape == (10, 6)
    assert np.isfinite(out["rmse"]).all() and np.isfinite(out["reconstruction"]).all()

    rng = np.random.default_rng(0)
    lat = out["latents"]
    X = np.concatenate([lat, lat + 1.0])
    y = np.concatenate([np.zeros(len(lat)), np.ones(len(lat))])
    gbt = GBTClassifier(max_depth=2, n_estimators=10, learning_rate=0.3).fit(
        X + 0.01 * rng.standard_normal(X.shape), y
    )
    out2 = scorer.attach_gbt(gbt).score(waves[:10])
    assert out2["probability"].shape == (10,)
    assert np.all((out2["probability"] >= 0) & (out2["probability"] <= 1))
