"""Training stack tests: Ranger math vs an independent oracle, schedules,
and an end-to-end smoke train/test cycle on synthetic arrays."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.schema import ArraySet, save_arrays
from ae_waveforms_tpu.train.ranger import ranger
from ae_waveforms_tpu.train.schedules import (
    cosine_annealing_warm_restarts,
    cosine_annealing_warmup_hard_restarts,
    step_lr,
)


def oracle_ranger_steps(w0, grads, lr=0.1, betas=(0.95, 0.999), eps=1e-5, wd=0.0, thr=5, k=6, alpha=0.5):
    """Direct transcription of the published RAdam+Lookahead equations."""
    import math

    w = np.array(w0, float)
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    slow = np.array(w0, float)
    out = []
    for t, g in enumerate(grads, start=1):
        v = betas[1] * v + (1 - betas[1]) * g * g
        m = betas[0] * m + (1 - betas[0]) * g
        b2t = betas[1] ** t
        n_max = 2 / (1 - betas[1]) - 1
        n_sma = n_max - 2 * t * b2t / (1 - b2t)
        if n_sma > thr:
            step_size = math.sqrt(
                (1 - b2t) * (n_sma - 4) / (n_max - 4) * (n_sma - 2) / n_sma * n_max / (n_max - 2)
            ) / (1 - betas[0] ** t)
        else:
            step_size = 1.0 / (1 - betas[0] ** t)
        if wd:
            w = w - w * wd * lr
        if n_sma > thr:
            w = w - step_size * lr * m / (np.sqrt(v) + eps)
        else:
            w = w - step_size * lr * m
        if t % k == 0:
            slow = slow + alpha * (w - slow)
            w = slow.copy()
        out.append(w.copy())
    return out


def test_ranger_matches_oracle():
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(20)]

    opt = ranger(0.1, weight_decay=0.01)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    traj = []
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        traj.append(np.asarray(params["w"]))

    ref = oracle_ranger_steps(w0, grads, lr=0.1, wd=0.01)
    # the SMA rectification scalar loses a few float32 digits right at the
    # threshold crossing (1999 - 1993.006); tolerance reflects realistic
    # float32 trajectory noise, not a semantic difference
    for got, want in zip(traj, ref):
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-5)


def test_schedules():
    s = step_lr(1e-3)
    assert s(0) == 1e-3 and s(2) == 0.25e-3

    c = cosine_annealing_warm_restarts(1e-3, t_0=100, eta_min=1e-4)
    assert abs(float(c(0)) - 1e-3) < 1e-9  # start of cycle
    assert abs(float(c(100)) - 1e-3) < 1e-9  # restart
    assert abs(float(c(50)) - (1e-4 + (1e-3 - 1e-4) * 0.5)) < 1e-8  # midpoint

    w = cosine_annealing_warmup_hard_restarts(1e-3, t_0=100, num_warmup_steps=10, min_lr=1e-5)
    assert float(w(0)) == 0.0
    assert abs(float(w(5)) - 0.5e-3) < 1e-9
    assert abs(float(w(10)) - 1e-3) < 1e-9  # restart boundary lambda == 1
    assert abs(float(w(110)) - 1e-3) < 1e-9
    assert float(w(60)) < 1e-3


def _toy_arrays(n=240, n_cases=20, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(-1, 2, 320)
    base = np.exp(-(t**2) / 0.02)  # R-like bump
    waves = base[None, :] + 0.1 * rng.standard_normal((n, 320))
    feats = rng.standard_normal((n, 35))
    case = np.repeat(np.arange(1, n_cases + 1), n // n_cases)
    info = np.stack([case, 10000.0 * (1 + np.arange(n) % 5)], axis=1)
    return ArraySet(waves=waves.astype(np.float32), features=feats, info=info)


def test_train_and_test_cycle(tmp_path):
    arrays = _toy_arrays()
    dataset_dir = str(tmp_path / "data")
    save_arrays(arrays, dataset_dir)

    cfg = TrainConfig(
        dataset_dir=dataset_dir,
        results_dir=str(tmp_path / "results"),
        model_class="LeNet5AutoencoderAvgPool",
        latent_size=4,
        batch_size=32,
        epochs=2,
        validation_interval=3,
        split_size_val=0.25,
        split_size_test=0.25,
        lr=3e-3,
        seed=1,
        plotting=False,
        tracker="jsonl",
    )
    from ae_waveforms_tpu.train.loop import main_train

    results_dir = main_train(cfg, arrays=arrays)

    assert os.path.isfile(os.path.join(results_dir, "model_init.npz"))
    assert os.path.isfile(os.path.join(results_dir, "model_autoencoder.npz"))
    assert os.path.isfile(os.path.join(results_dir, "training_log_validation.csv"))
    assert os.path.isfile(os.path.join(results_dir, "subject_ids_used_in_training.csv"))
    import glob as g

    assert g.glob(os.path.join(results_dir, "model_min_val_loss-*_params.npz"))

    # loss should drop over training
    import csv

    with open(os.path.join(results_dir, "training_log_validation.csv")) as f:
        rows = list(csv.reader(f))
    first, last = float(rows[0][4]), float(rows[-1][4])
    assert last < first

    # test pass: exports + metrics
    run_name = os.path.basename(results_dir)
    cfg_test = cfg.replace(mode="test", trained_model=run_name)
    from ae_waveforms_tpu.train.eval import main_test

    results_file, (loss, rmse, rmse_per, prd, prd_per), (pred, true, info), zs = main_test(
        cfg_test, arrays=arrays
    )
    assert os.path.isfile(results_file)
    assert pred.shape[1] == 320
    assert zs.shape[1] == 4
    assert np.isfinite(loss) and np.isfinite(rmse) and np.isfinite(prd)
    n_test = pred.shape[0]
    assert rmse_per.shape == (n_test,) and prd_per.shape == (n_test,)


def test_train_lstm_smoke(tmp_path):
    arrays = _toy_arrays(n=120, n_cases=20)
    dataset_dir = str(tmp_path / "data")
    save_arrays(arrays, dataset_dir)
    cfg = TrainConfig(
        dataset_dir=dataset_dir,
        results_dir=str(tmp_path / "results"),
        model_class="LSTMAutoencoder",
        latent_size=3,
        batch_size=16,
        epochs=1,
        validation_interval=2,
        split_size_val=0.3,
        split_size_test=0.2,
        optimizer_type="ranger",
        lr_scheduler_type="CosineAnnealingWarmup",
        seed=2,
        plotting=False,
    )
    from ae_waveforms_tpu.train.loop import main_train

    results_dir = main_train(cfg, arrays=arrays, max_steps=6)
    assert os.path.isfile(os.path.join(results_dir, "model_autoencoder.npz"))


def test_effective_epochs_rescale():
    """nr_train_ids > 0 rescales epochs to the 228,543-sample step budget
    (run_train.py:472 formula, preserved verbatim)."""
    from ae_waveforms_tpu.train.loop import effective_epochs

    cfg = TrainConfig(epochs=10, nr_train_ids=0)
    assert effective_epochs(cfg, 5000) == 10
    cfg2 = TrainConfig(epochs=10, nr_train_ids=50, batch_size=128)
    assert effective_epochs(cfg2, 5000) == int(np.ceil(228543 / (5000 / 128)))


def test_training_log_trailing_rows_flushed(tmp_path):
    """Train-step CSV rows logged after the last validation must survive to
    disk (reference writes every 10 steps unconditionally,
    run_train.py:305-309).  With validation_interval larger than the epoch,
    the only validation is at local step 0, so EVERY 10-step row is buffered
    past the last flush point — before the close() fix the file was never
    written at all."""
    import csv

    arrays = _toy_arrays(n=240, n_cases=20)
    dataset_dir = str(tmp_path / "data")
    save_arrays(arrays, dataset_dir)
    cfg = TrainConfig(
        dataset_dir=dataset_dir,
        results_dir=str(tmp_path / "results"),
        model_class="LeNet5AutoencoderAvgPool",
        latent_size=4,
        batch_size=8,
        epochs=1,
        validation_interval=1000,  # > steps_per_epoch: no flush-by-validation
        split_size_val=0.25,
        split_size_test=0.25,
        seed=1,
        plotting=False,
    )
    from ae_waveforms_tpu.train.loop import main_train

    results_dir = main_train(cfg, arrays=arrays)
    log_path = os.path.join(results_dir, "training_log.csv")
    assert os.path.isfile(log_path), "trailing train-step rows were dropped"
    with open(log_path) as f:
        rows = list(csv.reader(f))
    # every local step s with s % 10 == 0, s != 0 gets a row
    steps = [int(r[1]) for r in rows]
    assert steps and steps[0] == 10 and all(s % 10 == 0 for s in steps)

    # validation-driven flush still works and stays row-duplicate free
    with open(os.path.join(results_dir, "training_log_validation.csv")) as f:
        vrows = list(csv.reader(f))
    assert len(vrows) == 1  # only local step 0 validated


def test_csvlogs_close_flushes(tmp_path):
    from ae_waveforms_tpu.train.logs import CsvLogs

    logs = CsvLogs(str(tmp_path))
    logs.train_step(1, 10, 1e-3, 0.5)
    logs.train_step(1, 20, 1e-3, 0.4)
    assert not os.path.isfile(os.path.join(str(tmp_path), "training_log.csv"))
    logs.close()
    with open(os.path.join(str(tmp_path), "training_log.csv")) as f:
        assert len(f.read().strip().splitlines()) == 2
    logs.close()  # idempotent


def test_compute_dtype_flag(tmp_path):
    """compute_dtype='float32' runs under full-precision matmuls (smoke)."""
    arrays = _toy_arrays(n=120, n_cases=20)
    dataset_dir = str(tmp_path / "data")
    save_arrays(arrays, dataset_dir)
    cfg = TrainConfig(
        dataset_dir=dataset_dir, results_dir=str(tmp_path / "results"),
        model_class="LeNet5AutoencoderAvgPool", latent_size=4, batch_size=16,
        epochs=1, validation_interval=2, split_size_val=0.25, split_size_test=0.25,
        seed=1, plotting=False, compute_dtype="float32",
    )
    from ae_waveforms_tpu.train.loop import main_train

    run = main_train(cfg, arrays=arrays, max_steps=4)
    assert os.path.isdir(run)
