"""Product-surface multichip: the mesh knobs reachable from the CLI must
produce the same training/classification results as single-device runs.

Runs on the 8-device virtual CPU platform from conftest.py (the TPU-world
answer to multi-node testing without a cluster, SURVEY §4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.schema import ArraySet, save_arrays
from ae_waveforms_tpu.parallel.mesh import data_mesh


def _toy_arrays(n=192, n_cases=16, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(-1, 2, 320)
    base = np.exp(-(t**2) / 0.02)
    waves = base[None, :] + 0.1 * rng.standard_normal((n, 320))
    feats = rng.standard_normal((n, 35))
    case = np.repeat(np.arange(1, n_cases + 1), n // n_cases)
    info = np.stack([case, 10000.0 * (1 + np.arange(n) % 5)], axis=1)
    return ArraySet(waves=waves.astype(np.float32), features=feats, info=info)


def _chunk_losses(mesh, n_steps=6, batch=16):
    """Run the shipped fused train chunk on the given mesh; same inputs and
    PRNG regardless of mesh shape."""
    from ae_waveforms_tpu.models.registry import MODEL_REGISTRY
    from ae_waveforms_tpu.train.loop import make_train_chunk
    from ae_waveforms_tpu.train.optimizers import make_optimizer

    mdef = MODEL_REGISTRY["LeNet5AutoencoderAvgPool"]
    params = mdef.init(jax.random.PRNGKey(0), 4)
    optimizer = make_optimizer("adam", 1e-3)
    opt_state = optimizer.init(params)
    schedule = lambda step: jnp.asarray(1e-3, jnp.float32)  # noqa: E731
    run_chunk = make_train_chunk(mdef, optimizer, "mse", schedule, mesh, dropout_rate=0.0)

    rng_np = np.random.default_rng(0)
    data_x = jnp.asarray(rng_np.standard_normal((8 * batch, 1, 320)), jnp.float32)
    idx = jnp.asarray(rng_np.integers(0, 8 * batch, size=(n_steps, batch)).astype(np.int32))
    mask = jnp.ones((n_steps, batch), bool)
    params, opt_state, _, losses, _ = run_chunk(
        params, opt_state, jax.random.PRNGKey(1), data_x, idx, mask,
        jnp.asarray(0, jnp.int32), jnp.asarray(1.0, jnp.float32), n_steps,
    )
    return np.asarray(losses), params


def test_sharded_train_chunk_matches_single_device():
    """DP over 8 devices must reproduce the 1-device loss trajectory to f32
    tolerance (gradient psum vs local sum is the only reduction-order
    difference)."""
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    losses_1, params_1 = _chunk_losses(data_mesh(1))
    losses_8, params_8 = _chunk_losses(data_mesh(8))
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-5, atol=2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        ),
        params_1, params_8,
    )


def test_sharded_2d_mesh_train_chunk_matches():
    """The (data=4, model=2) grid the CLI's --model_parallel selects must
    also reproduce the single-device trajectory (params replicated over
    'model'; the axis is exercised by tp layers, not the AE)."""
    losses_1, _ = _chunk_losses(data_mesh(1))
    losses_42, _ = _chunk_losses(data_mesh(8, model_parallel=2))
    np.testing.assert_allclose(losses_42, losses_1, rtol=2e-5, atol=2e-6)


def test_main_train_cli_n_devices(tmp_path):
    """A user can run data-parallel training from the CLI without writing
    Python (VERDICT r2 #6): --n_devices 8 must train and save artifacts."""
    arrays = _toy_arrays()
    dataset_dir = str(tmp_path / "data")
    save_arrays(arrays, dataset_dir)

    from ae_waveforms_tpu.cli.main_ae import autoencoder

    # --train_shuffle "": the split-mask cache written by the first run
    # changes the second run's np.random stream (reference-inherited
    # behavior, load_data.py:113-131), so shuffled permutations would differ
    # between the runs for reasons unrelated to sharding
    common = [
        "-m", "train", "--dataset_dir", dataset_dir,
        "--model_class", "LeNet5AutoencoderAvgPool", "--latent_size", "4",
        "--batch_size", "16", "--epochs", "1", "--validation_interval", "3",
        "--split_size_val", "0.25", "--split_size_test", "0.25",
        "--plotting", "", "--train_shuffle", "",
    ]
    run_dir = autoencoder(common + ["--results_dir", str(tmp_path / "r8"), "--n_devices", "8"])
    assert os.path.isfile(os.path.join(run_dir, "model_autoencoder.npz"))

    # single-device run with identical flags: loss trajectories must agree
    run_dir_1 = autoencoder(common + ["--results_dir", str(tmp_path / "r1"), "--n_devices", "1"])
    import csv

    def val_rows(d):
        with open(os.path.join(d, "training_log_validation.csv")) as f:
            return [[float(v) for v in r] for r in csv.reader(f)]

    r8, r1 = val_rows(run_dir), val_rows(run_dir_1)
    assert len(r8) == len(r1) and len(r8) > 0
    for a, b in zip(r8, r1):
        np.testing.assert_allclose(a, b, rtol=1e-4)


def test_sharded_extraction_matches_single_device(tmp_path):
    """The streaming device-extraction pipeline with its window chunks
    sharded over 8 devices must reproduce the single-device results — the
    kernel is row-independent, so partitioning the window axis changes no
    per-row math (multi-chip scale-out of the reference's mp.Pool fan-out,
    data_extract_vitaldb.py:194-199)."""
    from ae_waveforms_tpu.core.config import ExtractionConfig
    from ae_waveforms_tpu.data.extract import extract_cases_batched
    from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record

    cfg = ExtractionConfig(delineation_engine="device")
    records = {c: synthetic_ecg_record(duration_s=60.0, seed=100 + c) for c in range(12)}
    kw = dict(cfg=cfg, cache_dir=None, windows_per_batch=16)
    base = extract_cases_batched(list(records), records.get, **kw)
    sharded = extract_cases_batched(list(records), records.get, mesh=data_mesh(8), **kw)

    assert [r.case_id for r in sharded] == [r.case_id for r in base]
    for a, b in zip(base, sharded):
        assert b.n_windows_raw == a.n_windows_raw
        np.testing.assert_array_equal(b.waves, a.waves)
        np.testing.assert_array_equal(b.features, a.features)
        np.testing.assert_array_equal(b.indices, a.indices)

    # uneven chunk split over the mesh is rejected up front
    import pytest

    with pytest.raises(ValueError, match="divide evenly"):
        extract_cases_batched(list(records), records.get, cfg=cfg, cache_dir=None,
                              windows_per_batch=12, mesh=data_mesh(8))


def test_classify_mesh_seed_sharding_matches():
    """_fit_eval_vectorized with a seed-sharded mesh (the classify CLI's
    --n_devices path, incl. the zero-weight pad to a mesh multiple) must
    reproduce the unsharded probabilities."""
    from ae_waveforms_tpu.classify.harness import _fit_eval_vectorized, prepare_class_data

    rng = np.random.default_rng(3)
    control = rng.standard_normal((200, 6)).astype(np.float32)
    sick = (rng.standard_normal((200, 6)) + 1.2).astype(np.float32)
    data = prepare_class_data(control, sick, test_size=60)
    params = dict(max_depth=3, learning_rate=0.2, n_estimators=20, gamma=0.0,
                  min_child_weight=1, subsample=1.0, colsample_bytree=1.0)

    from sklearn.metrics import roc_auc_score

    # pad-free case (8 seeds over 8 devices).  Sharding changes f32
    # reduction order inside the histogram matmuls, and the GBT's argmax
    # split selection amplifies a near-tie flip discretely — so the honest
    # guarantee is near-total elementwise equality plus identical quality,
    # not bitwise match (same caveat as any distributed GBDT).
    base8 = _fit_eval_vectorized(data, 80, 8, params, None)
    sharded8 = _fit_eval_vectorized(data, 80, 8, params, None, mesh=data_mesh(8))
    close = np.isclose(sharded8, base8, atol=1e-5)
    assert close.mean() > 0.99, f"only {close.mean():.3f} of probabilities match"
    for s in range(8):
        auc_b = roc_auc_score(data.y_test, base8[s])
        auc_s = roc_auc_score(data.y_test, sharded8[s])
        assert abs(auc_b - auc_s) < 0.01

    # padded case (5 -> 8 with zero-weight rows): shape + quality
    sharded5 = _fit_eval_vectorized(data, 80, 5, params, None, mesh=data_mesh(8))
    assert sharded5.shape == (5, len(data.y_test))
    for s in range(5):
        assert roc_auc_score(data.y_test, sharded5[s]) > 0.8
