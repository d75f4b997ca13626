"""CLI surface tests: flag defaults, train/test via the argparse front-end,
extraction CLI artifacts."""

import os

import numpy as np

from ae_waveforms_tpu.cli.main_ae import autoencoder, build_parser, config_from_args


def test_parser_defaults_match_reference_surface():
    args = build_parser().parse_args([])
    assert args.mode == "train"
    assert args.model_class == "LSTMAutoencoder"
    assert args.latent_size == 10
    assert args.batch_size == 128
    assert args.epochs == 10
    assert args.validation_interval == 200
    assert args.early_stopping_patience == 2000
    assert args.loss == "mse"
    assert args.lr == 1e-3
    assert args.lr_scheduler_type == "StepLR"
    assert args.optimizer_type == "adam"
    assert args.lr_scheduler_caw_settings == [0.02, 10, 1e-5]
    assert args.trained_model == "AUT-231"
    cfg = config_from_args(args)
    assert cfg.split_size_val == 0.02 and cfg.split_size_test == 0.01


def test_cli_train_then_test(tmp_path):
    from ae_waveforms_tpu.core.schema import save_arrays
    from tests.test_train import _toy_arrays

    data_dir = str(tmp_path / "data")
    results_dir = str(tmp_path / "results")
    save_arrays(_toy_arrays(n=120, n_cases=20), data_dir)

    out_dir = autoencoder([
        "-m", "train", "--dataset_dir", data_dir, "--results_dir", results_dir,
        "--model_class", "LeNet5AutoencoderAvgPool", "--latent_size", "4",
        "--batch_size", "16", "--epochs", "1", "--validation_interval", "3",
        "--split_size_val", "0.25", "--split_size_test", "0.25", "--seed", "1",
        "--plotting", "",
    ])
    assert os.path.isdir(out_dir)
    run_name = os.path.basename(out_dir)

    result = autoencoder([
        "-m", "test", "--dataset_dir", data_dir, "--results_dir", results_dir,
        "--model_class", "LeNet5AutoencoderAvgPool", "--latent_size", "4",
        "--trained_model", run_name, "--plotting", "",
    ])
    test_loss, rmse, rmse_samples, prd, prd_samples, pred, true, c = result
    assert np.isfinite(test_loss) and np.isfinite(rmse)
    assert pred.shape[1] == 320


def test_cli_classify_deep_n_devices(tmp_path):
    """`classify deep --n_devices 8` must actually shard the seed sweep over
    the mesh (the flag was once a silent single-device no-op for this task)
    and write the same artifact set as the sequential path."""
    from ae_waveforms_tpu.cli.classify import main as classify_main

    rng = np.random.default_rng(0)
    n, length = 600, 64  # 300/class: the fixed 250-beat test tail needs >251
    ids = np.arange(n)
    waves = rng.standard_normal((n, length)).astype(np.float32)
    waves[n // 2:] += 1.2  # separable classes
    info = np.stack([ids, np.zeros(n)], axis=1)
    data = tmp_path / "data"
    data.mkdir()
    np.save(data / "np_info.npy", info)
    np.save(data / "np_waves.npy", waves)
    for fname, sel in [("controls.csv", ids[: n // 2]), ("sick.csv", ids[n // 2:])]:
        with open(data / fname, "w") as f:
            f.write("idx,id\n")
            for i, cid in enumerate(sel):
                f.write(f"{i},{cid}\n")

    classify_main([
        "deep", "--data", str(data), "--sick_file", "sick.csv",
        "--sizes", "10", "--seeds", "2", "--epochs", "1", "--n_devices", "8",
    ])
    out = data / "1_sick"
    assert (out / "summary_auc_stats.csv").exists()
    assert (out / "size_10" / "aucs_size_10.csv").exists()
    rows = (out / "size_10" / "aucs_size_10.csv").read_text().strip().splitlines()
    assert len(rows) == 3  # header + 2 seeds (mesh padding sliced off)
