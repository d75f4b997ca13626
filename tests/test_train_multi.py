"""Multi-configuration AE training (train/multi.py): the vmapped S-config
block must reproduce sequential single-config runs exactly (vmap is a
batching transform, not a semantic one), match main_train's own losses for
the identical fixed split, shard over the mesh without changing results,
and honour the lr-multiplier sweep axis.

Reference workload this capability serves: the trad-vs-AE analysis consumes
two separately trained AEs (analysis_performance_traditional_vs_ae.py:
226-230) and the seed studies train one model per process
(main_ae.py trains a single configuration per run)."""

import os

import numpy as np
import pytest

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.schema import save_arrays
from ae_waveforms_tpu.parallel.mesh import data_mesh
from ae_waveforms_tpu.train.multi import train_ae_multi

from test_train import _toy_arrays


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multi")
    arrays = _toy_arrays(n=240, n_cases=20)
    dataset_dir = str(tmp / "data")
    save_arrays(arrays, dataset_dir)
    cfg = TrainConfig(
        dataset_dir=dataset_dir,
        results_dir=str(tmp / "results"),
        model_class="LSTMAutoencoder",
        latent_size=3,
        batch_size=16,
        epochs=2,
        validation_interval=3,
        split_size_val=0.25,
        split_size_test=0.25,
        lr=3e-3,
        seed=1,
        plotting=False,
    )
    return cfg, arrays


def test_multi_matches_singles(setup):
    """S=3 vmapped == three S=1 runs, config by config (f32 tolerance:
    vmap changes XLA fusion order, not math)."""
    cfg, arrays = setup
    multi = train_ae_multi(cfg, seeds=[3, 4, 5], arrays=arrays, max_steps=12)
    assert multi.train_losses.shape[1] == 3
    assert np.all(np.isfinite(multi.train_losses))
    for i, seed in enumerate([3, 4, 5]):
        single = train_ae_multi(cfg, seeds=[seed], arrays=arrays, max_steps=12)
        np.testing.assert_allclose(
            single.train_losses[:, 0], multi.train_losses[:, i], rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            single.val_losses[:, 0], multi.val_losses[:, i], rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(single.best_val[0], multi.best_val[i], rtol=2e-5)


def test_multi_matches_main_train(setup, tmp_path):
    """With train_shuffle=False the S=1 multi path replays main_train's
    exact rng chain (PRNGKey(seed) -> split -> k_init; per-step dropout-key
    splits) and batch order, so its validation losses must match the
    sequential trainer's CSV row for row (cross-implementation parity, not
    just vmap parity)."""
    import csv

    from ae_waveforms_tpu.train.loop import main_train

    cfg, arrays = setup
    cfg = cfg.replace(train_shuffle=False, results_dir=str(tmp_path / "seq"))
    results_dir = main_train(cfg, arrays=arrays, max_steps=12)
    with open(os.path.join(results_dir, "training_log_validation.csv")) as f:
        seq_val = np.asarray([float(r[4]) for r in csv.reader(f)])

    multi = train_ae_multi(cfg, seeds=[cfg.seed], arrays=arrays, max_steps=12)
    got = multi.val_losses[: len(seq_val), 0]
    np.testing.assert_allclose(got, seq_val, rtol=2e-5, atol=1e-6)


def test_multi_mesh_matches_unsharded(setup):
    """Sharding the config axis over the 8-device mesh (with seed padding
    to a multiple of the data axis) must not change any per-config result."""
    cfg, arrays = setup
    seeds = [3, 4, 5, 6]
    plain = train_ae_multi(cfg, seeds=seeds, arrays=arrays, max_steps=6)
    sharded = train_ae_multi(
        cfg, seeds=seeds, arrays=arrays, max_steps=6, mesh=data_mesh(8)
    )
    assert sharded.train_losses.shape[1] == len(seeds)  # padding trimmed
    np.testing.assert_allclose(
        sharded.train_losses, plain.train_losses, rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(sharded.best_val, plain.best_val, rtol=2e-5)
    # stacked best params trim back to the real configs
    leaf = next(iter(jax_leaves(sharded.best_params)))
    assert leaf.shape[0] == len(seeds)


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_multi_lr_multiplier_axis(setup):
    """The optional lr-multiplier axis is a real second sweep dimension:
    multiplier 1.0 reproduces the default, a different multiplier diverges."""
    cfg, arrays = setup
    base = train_ae_multi(cfg, seeds=[3, 3], arrays=arrays, max_steps=6,
                          lr_multipliers=[1.0, 0.25])
    np.testing.assert_allclose(
        base.train_losses[0, 0], base.train_losses[0, 1], rtol=1e-6
    )  # identical before the first update takes effect
    assert not np.allclose(base.train_losses[-1, 0], base.train_losses[-1, 1])

    default = train_ae_multi(cfg, seeds=[3], arrays=arrays, max_steps=6)
    np.testing.assert_allclose(
        default.train_losses[:, 0], base.train_losses[:, 0], rtol=2e-5, atol=1e-6
    )


def test_multi_early_stop_freezes_best(setup):
    """A stopped configuration's best snapshot and counters freeze while
    other configs continue (the classify/dl.py carry pattern)."""
    cfg, arrays = setup
    cfg = cfg.replace(early_stopping_patience=1, epochs=3)
    res = train_ae_multi(cfg, seeds=[3, 4, 5], arrays=arrays)
    assert res.ever_improved.all()
    assert np.all(np.isfinite(res.best_val))
    # params_for returns per-config trees with the leading axis stripped
    p0 = res.params_for(0)
    leaf = jax_leaves(p0)[0]
    assert leaf.ndim == jax_leaves(res.best_params)[0].ndim - 1


def test_grouped_spans_latent_sizes(setup):
    """The reference's analysis pair (d=10 + d=20 AEs) spans latent sizes —
    one vmap cannot batch different parameter shapes, so the grouped entry
    trains one program per latent size and keys results by it."""
    from ae_waveforms_tpu.train.multi import train_ae_multi_grouped

    cfg, arrays = setup
    out = train_ae_multi_grouped(
        cfg, configs=[(3, 3), (5, 7), (3, 4)], arrays=arrays, max_steps=6
    )
    assert sorted(out) == [3, 5]
    assert out[3].seeds == [3, 4] and out[5].seeds == [7]
    # each group matches its own direct call (same split, same streams)
    direct = train_ae_multi(cfg.replace(latent_size=5), seeds=[7],
                            arrays=arrays, max_steps=6)
    np.testing.assert_allclose(
        out[5].train_losses[:, 0], direct.train_losses[:, 0], rtol=2e-5, atol=1e-6
    )


def test_cli_lr_sweep_crosses_seeds(tmp_path):
    """`main_ae -m train --seeds A,B --lr_sweep 1,0.25` trains the full
    (seed x multiplier) cross in one vmapped program and writes one
    main_test-loadable run dir per pair, lr-tagged when the multiplier
    isn't 1 (the reference sweeps lr by editing main_ae.py:62 and
    re-running once per value)."""
    from ae_waveforms_tpu.cli.main_ae import autoencoder

    data_dir = str(tmp_path / "data")
    save_arrays(_toy_arrays(n=120, n_cases=20), data_dir)
    run_dirs = autoencoder([
        "-m", "train", "--dataset_dir", data_dir,
        "--results_dir", str(tmp_path / "results"),
        "--model_class", "LSTMAutoencoder", "--latent_size", "3",
        "--batch_size", "16", "--epochs", "1", "--validation_interval", "3",
        "--split_size_val", "0.25", "--split_size_test", "0.25",
        "--seed", "1", "--plotting", "",
        "--seeds", "3,4", "--lr_sweep", "1,0.25",
    ])
    names = [os.path.basename(d) for d in run_dirs]
    assert len(names) == 4
    for seed in (3, 4):
        assert any(n.endswith(f"-s{seed}-lr1") for n in names)
        assert any(n.endswith(f"-s{seed}-lr0.25") for n in names)
    assert all(os.path.isdir(d) for d in run_dirs)


def test_cli_latent_sizes_grouped(tmp_path):
    """`main_ae -m train --latent_sizes 3,5` trains one vmapped program per
    latent size (the reference's analysis pair d=10 + d=20 in one command,
    analysis_performance_traditional_vs_ae.py:226-230), crossing seeds and
    lr multipliers inside each group; run dirs carry the latent tag so the
    groups cannot collide."""
    from ae_waveforms_tpu.cli.main_ae import autoencoder
    from ae_waveforms_tpu.train.eval import main_test
    from ae_waveforms_tpu.core.config import TrainConfig as TC

    data_dir = str(tmp_path / "data")
    results_dir = str(tmp_path / "results")
    save_arrays(_toy_arrays(n=120, n_cases=20), data_dir)
    base_args = [
        "-m", "train", "--dataset_dir", data_dir, "--results_dir", results_dir,
        "--model_class", "LSTMAutoencoder", "--batch_size", "16",
        "--epochs", "1", "--validation_interval", "3",
        "--split_size_val", "0.25", "--split_size_test", "0.25",
        "--seed", "1", "--plotting", "",
    ]
    run_dirs = autoencoder(base_args + [
        "--latent_sizes", "3,5", "--seeds", "3", "--lr_sweep", "1,0.5",
    ])
    names = [os.path.basename(d) for d in run_dirs]
    assert len(names) == 4
    for d in (3, 5):
        assert any(f"-d{d}-s3-lr1" in n and n.endswith("-lr1") for n in names)
        assert any(n.endswith(f"-lr0.5") and f"-d{d}-" in n for n in names)
    # a grouped run dir loads through main_test at its own latent size
    pick = next(n for n in names if "-d5-" in n and n.endswith("-lr0.5"))
    tcfg = TC(mode="test", dataset_dir=data_dir, results_dir=results_dir,
              model_class="LSTMAutoencoder", latent_size=5,
              trained_model=pick, plotting=False)
    (_, (test_loss, *_r), _p, _) = main_test(tcfg)
    assert np.isfinite(test_loss)


def test_per_config_splits_redraw_membership(setup, tmp_path):
    """per_config_splits=True redraws the patient split UNDER EACH SEED
    (the sequential chain: np.random.seed(seed) -> draw, main_ae.py:128-133
    before split_datasets) — run dirs carry each config's OWN masks, the
    memberships differ across seeds, and each equals the seed's host draw
    (size-equalised to the smallest per-split count)."""
    from ae_waveforms_tpu.train.data import draw_split_masks

    cfg, arrays = setup
    cfg = cfg.replace(results_dir=str(tmp_path / "percfg"))
    res = train_ae_multi(cfg, seeds=[3, 4], arrays=arrays, max_steps=6,
                         per_config_splits=True, save_runs=True)
    assert len(res.run_dirs) == 2

    expected = {}
    for seed in (3, 4):
        np.random.seed(seed)
        expected[seed] = draw_split_masks(
            arrays.info[:, 0], cfg.split_size_val, cfg.split_size_test)
    n_tr = min(int(expected[s]["train"].sum()) for s in (3, 4))
    n_va = min(int(expected[s]["val"].sum()) for s in (3, 4))

    import glob as g
    got = {}
    for seed, run_dir in zip((3, 4), res.run_dirs):
        got[seed] = {
            split: np.load(g.glob(os.path.join(run_dir, f"indices_{split}_*.npy"))[0])
            for split in ("train", "val", "test")
        }
        # equalised memberships are prefixes of the seed's own draw
        exp_tr = np.flatnonzero(expected[seed]["train"])[:n_tr]
        exp_va = np.flatnonzero(expected[seed]["val"])[:n_va]
        np.testing.assert_array_equal(np.flatnonzero(got[seed]["train"]), exp_tr)
        np.testing.assert_array_equal(np.flatnonzero(got[seed]["val"]), exp_va)
        np.testing.assert_array_equal(got[seed]["test"], expected[seed]["test"])
    # the two configs actually see different data
    assert not np.array_equal(got[3]["train"], got[4]["train"])


def test_per_config_single_matches_sequential_redraw(tmp_path):
    """An S=1 per-config run IS the sequential study member: it must match
    a shared-split run whose cfg.seed equals that seed (fresh dataset dir,
    so split_datasets actually draws rather than loading a cached mask)."""
    arrays = _toy_arrays(n=240, n_cases=20)
    kw = dict(
        model_class="LSTMAutoencoder", latent_size=3, batch_size=16,
        epochs=2, validation_interval=3, split_size_val=0.25,
        split_size_test=0.25, lr=3e-3, plotting=False,
    )
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    save_arrays(arrays, d1)
    save_arrays(arrays, d2)
    shared = train_ae_multi(
        TrainConfig(dataset_dir=d1, results_dir=str(tmp_path / "r1"), seed=3, **kw),
        seeds=[3], arrays=arrays, max_steps=9)
    percfg = train_ae_multi(
        TrainConfig(dataset_dir=d2, results_dir=str(tmp_path / "r2"), seed=1, **kw),
        seeds=[3], arrays=arrays, max_steps=9, per_config_splits=True)
    np.testing.assert_allclose(percfg.train_losses, shared.train_losses,
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(percfg.val_losses, shared.val_losses,
                               rtol=2e-5, atol=1e-6)


def test_multi_resume_bitcompat(setup, tmp_path):
    """checkpoint_every + resume_dir: killing a multi-config study mid-sweep
    and resuming from its checkpoint reproduces the uninterrupted run
    BIT-COMPATIBLY (same host streams, same segment grouping, same device
    programs) — on the sharded virtual mesh."""
    cfg, arrays = setup
    mesh = data_mesh(2)
    rd_full = str(tmp_path / "full")
    rd_ck = str(tmp_path / "ck")
    full = train_ae_multi(cfg, seeds=[3, 4], arrays=arrays, max_steps=12,
                          results_dir=rd_full, mesh=mesh)
    part = train_ae_multi(cfg, seeds=[3, 4], arrays=arrays, max_steps=6,
                          results_dir=rd_ck, mesh=mesh, checkpoint_every=1)
    assert os.path.exists(os.path.join(rd_ck, "multi_checkpoint_d3.npz"))
    resumed = train_ae_multi(cfg, seeds=[3, 4], arrays=arrays, max_steps=12,
                             results_dir=rd_ck, mesh=mesh, checkpoint_every=1,
                             resume_dir=rd_ck)
    assert resumed.train_losses.shape == full.train_losses.shape
    np.testing.assert_array_equal(resumed.train_losses, full.train_losses)
    np.testing.assert_array_equal(resumed.val_losses, full.val_losses)
    np.testing.assert_array_equal(resumed.best_val, full.best_val)
    for a, b in zip(jax_leaves(resumed.best_params), jax_leaves(full.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the interrupted prefix matches too (the checkpoint recorded history)
    np.testing.assert_array_equal(part.train_losses,
                                  full.train_losses[: part.train_losses.shape[0]])


def test_multi_resume_refuses_different_study(setup, tmp_path):
    """A checkpoint from one study must not silently seed another: the run
    fingerprint (seeds, lr multipliers, model, shapes) is enforced."""
    cfg, arrays = setup
    rd = str(tmp_path / "fp")
    train_ae_multi(cfg, seeds=[3, 4], arrays=arrays, max_steps=3,
                   results_dir=rd, checkpoint_every=1)
    with pytest.raises(ValueError, match="refusing to resume"):
        train_ae_multi(cfg, seeds=[3, 5], arrays=arrays, max_steps=6,
                       results_dir=rd, resume_dir=rd)


def test_duplicate_configs_get_distinct_run_dirs(setup, tmp_path):
    """--seeds 3,3 (duplicate configs in one call) must not collapse into
    one run dir with the second checkpoint overwriting the first."""
    cfg, arrays = setup
    cfg = cfg.replace(results_dir=str(tmp_path / "dup"))
    res = train_ae_multi(cfg, seeds=[3, 3], arrays=arrays, max_steps=3,
                         save_runs=True)
    assert len(res.run_dirs) == 2
    assert len(set(res.run_dirs)) == 2
    assert all(os.path.isdir(d) for d in res.run_dirs)


def test_save_runs_feeds_main_test(setup):
    """save_runs=True writes main_train-shaped run dirs: main_test must
    load each config's best checkpoint and split masks unchanged."""
    from ae_waveforms_tpu.train.eval import main_test

    cfg, arrays = setup
    res = train_ae_multi(cfg, seeds=[3, 4], arrays=arrays, max_steps=6,
                         save_runs=True)
    assert res.run_dirs is not None and len(res.run_dirs) == 2
    for i, run_dir in enumerate(res.run_dirs):
        assert os.path.isdir(run_dir)
        run_id = os.path.basename(run_dir)
        assert run_id.endswith(f"-s{res.seeds[i]}")
        tcfg = cfg.replace(mode="test", trained_model=run_id)
        (_, (test_loss, *_rest), _preds, _) = main_test(tcfg, arrays=arrays)
        assert np.isfinite(test_loss)
