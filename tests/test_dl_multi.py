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


def test_epoch_block_matches_host_epoch_loop():
    """The fused multi-epoch program (scan over epochs + device AUC +
    on-device early-stop carry) must reproduce the per-epoch host loop: same
    parameter trajectory (same _epoch_core math) and the same per-epoch
    validation AUCs as sklearn computes on host."""
    import jax
    import jax.numpy as jnp
    from sklearn.metrics import roc_auc_score

    from ae_waveforms_tpu.classify.dl import (
        _epoch_block_multi,
        _predict_multi,
        _train_epoch_multi,
    )
    from ae_waveforms_tpu.models import lstm_classifier

    rng = np.random.default_rng(5)
    S, n, m, T, B, E = 2, 32, 16, 48, 16, 3
    Xs = rng.standard_normal((S, n, T, 1)).astype(np.float32)
    ys = (rng.uniform(size=(S, n)) > 0.5).astype(np.float32)
    Xvs = rng.standard_normal((S, m, T, 1)).astype(np.float32)
    yvs = np.tile([0.0, 1.0], (S, m // 2)).astype(np.float32)

    def init_all():
        keys = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))
        init_keys, run_keys = jax.vmap(jax.random.split, out_axes=1)(keys)
        params, state = jax.vmap(lstm_classifier.init)(init_keys)
        zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)  # noqa: E731
        return params, state, zeros(params), zeros(params), jnp.zeros((S,), jnp.float32), run_keys

    steps = n // B
    perms = np.stack(
        [np.stack([np.random.default_rng(s).permutation(n) for _ in range(E)]) for s in range(S)]
    ).astype(np.int32)  # (S, E, n)
    idx = perms.reshape(S, E, steps, B)
    mask = np.ones((S, E, steps, B), bool)
    lrs = jnp.full((E,), 1e-3, jnp.float32)

    # host loop: one epoch per dispatch, sklearn AUC
    params, state, om, ov, ot, rngs = init_all()
    host_aucs = np.zeros((S, E))
    for e in range(E):
        params, state, om, ov, ot, rngs, _ = _train_epoch_multi(
            params, state, om, ov, ot, rngs,
            jnp.asarray(Xs), jnp.asarray(ys),
            jnp.asarray(idx[:, e]), jnp.asarray(mask[:, e]), lrs[e],
        )
        probs = np.asarray(_predict_multi(params, state, jnp.asarray(Xvs)))
        for s in range(S):
            host_aucs[s, e] = roc_auc_score(yvs[s], probs[s])
    params_host = jax.tree_util.tree_map(np.asarray, params)

    # fused block: all E epochs + device AUC + ES carry in one dispatch
    params, state, om, ov, ot, rngs = init_all()
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)  # noqa: E731
    out = _epoch_block_multi(
        params, state, om, ov, ot, rngs, copy(params), copy(state),
        jnp.zeros((S,), jnp.float32), jnp.zeros((S,), jnp.int32),
        jnp.zeros((S,), bool),
        jnp.asarray(Xs), jnp.asarray(ys), jnp.asarray(idx), jnp.asarray(mask),
        lrs, jnp.asarray(Xvs), jnp.asarray(yvs),
        jnp.asarray(50, jnp.int32), jnp.asarray(5e-4, jnp.float32),
    )
    params_block, block_aucs = out[0], np.asarray(out[11])

    np.testing.assert_allclose(block_aucs, host_aucs, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(b), a, rtol=2e-4, atol=2e-5),
        params_host, params_block,
    )
    # best snapshot: monotone best tracking means best_auc == max over epochs
    np.testing.assert_allclose(np.asarray(out[8]), host_aucs.max(axis=1), atol=1e-5)


def test_multi_seed_training_shards_over_mesh():
    """The vmapped multi-seed epoch runs with its seed axis sharded over an
    8-device mesh (the DL harness counterpart of joblib fan-out)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ae_waveforms_tpu.classify.dl import _train_epoch_multi
    from ae_waveforms_tpu.models import lstm_classifier
    from ae_waveforms_tpu.parallel.mesh import data_mesh

    mesh = data_mesh(8)
    S, n, T, B = 8, 32, 48, 16
    rng = np.random.default_rng(0)

    keys = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))
    params, state = jax.vmap(lstm_classifier.init)(keys)
    shard = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data", *[None] * (a.ndim - 1)))), tree
    )
    params, state = shard(params), shard(state)
    opt_m = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt_v = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt_t = jax.device_put(jnp.zeros((S,), jnp.float32), NamedSharding(mesh, P("data")))

    x = shard(jnp.asarray(rng.standard_normal((S, n, T, 1)), jnp.float32))
    y = shard(jnp.asarray((rng.uniform(size=(S, n)) > 0.5), jnp.float32))
    steps = n // B
    idx = shard(jnp.asarray(np.tile(np.arange(n, dtype=np.int32).reshape(1, steps, B), (S, 1, 1))))
    mask = shard(jnp.ones((S, steps, B), bool))
    rngs = shard(keys)

    out = _train_epoch_multi(params, state, opt_m, opt_v, opt_t, rngs, x, y, idx, mask,
                             jnp.asarray(1e-3, jnp.float32))
    losses = np.asarray(out[-1])
    assert losses.shape == (S, steps)
    assert np.isfinite(losses).all()


def test_sweep_mesh_matches_unsharded():
    """The product-level mesh path (dl_size_seed_sweep(mesh=...)) pads the
    seed axis to a mesh multiple, shards it, and reproduces the unsharded
    vectorized results for the real seeds."""
    from ae_waveforms_tpu.classify.dl import dl_size_seed_sweep
    from ae_waveforms_tpu.parallel.mesh import data_mesh

    control, sick = _cohorts()
    kw = dict(sizes=[20], n_seeds=3, num_epochs=2, test_size=20)
    vec = dl_size_seed_sweep(control, sick, vectorized=True, **kw)
    mesh = dl_size_seed_sweep(control, sick, mesh=data_mesh(8), **kw)
    np.testing.assert_allclose(mesh[0]["aucs"], vec[0]["aucs"], atol=1e-4)


def test_never_improved_falls_back_to_final_params():
    """A seed whose validation AUC never clears min_delta must return its
    FINAL trained params (train_classifier's fallback), not the untrained
    init.  min_delta=10 is unimprovable (falls back) and min_delta=-1e9
    improves every epoch (best == last epoch); identical seeds/data mean
    both must return the same final-epoch params."""
    import jax

    from ae_waveforms_tpu.classify.dl import train_classifier_multi
    from ae_waveforms_tpu.models import lstm_classifier

    rng = np.random.default_rng(3)
    S, n, m, T = 1, 32, 12, 48
    Xs = rng.standard_normal((S, n, T, 1)).astype(np.float32)
    ys = (rng.uniform(size=(S, n)) > 0.5).astype(np.float32)
    Xvs = rng.standard_normal((S, m, T, 1)).astype(np.float32)
    yvs = np.tile([0.0, 1.0], (S, m // 2)).astype(np.float32)

    kw = dict(num_epochs=2, batch_size=16, seeds=[0])
    never = train_classifier_multi(Xs, ys, Xvs, yvs, min_delta=10.0, **kw)
    always = train_classifier_multi(Xs, ys, Xvs, yvs, min_delta=-1e9, **kw)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        never[0][0], always[0][0],
    )
    # and the fallback is NOT the untrained init
    keys = jax.vmap(jax.random.PRNGKey)(np.asarray([0], np.uint32))
    init_keys, _ = jax.vmap(jax.random.split, out_axes=1)(keys)
    params0, _ = jax.vmap(lstm_classifier.init)(init_keys)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        never[0][0], jax.tree_util.tree_map(lambda a: np.asarray(a[0]), params0),
    )
    assert max(jax.tree_util.tree_leaves(deltas)) > 1e-6


def test_lstm_remat_matches_plain():
    """Chunked-remat LSTM: identical outputs AND gradients to the plain
    scan, including a T not divisible by the chunk (padded tail)."""
    import jax
    import jax.numpy as jnp

    from ae_waveforms_tpu.models.layers import lstm_apply, lstm_apply_remat, lstm_init

    rng = np.random.default_rng(0)
    for T in (40, 47):  # 47: pad path, h_last from the last real step
        params = lstm_init(jax.random.PRNGKey(0), 3, 16)
        x = jnp.asarray(rng.standard_normal((4, T, 3)), jnp.float32)

        out_p, last_p = lstm_apply(params, x)
        out_r, last_r = lstm_apply_remat(params, x, chunk=20)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p), atol=1e-6)
        np.testing.assert_allclose(np.asarray(last_r), np.asarray(last_p), atol=1e-6)

        loss_p = lambda p: jnp.sum(lstm_apply(p, x)[0] ** 2)  # noqa: E731
        loss_r = lambda p: jnp.sum(lstm_apply_remat(p, x, chunk=20)[0] ** 2)  # noqa: E731
        g_p = jax.grad(loss_p)(params)
        g_r = jax.grad(loss_r)(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            ),
            g_r, g_p,
        )


def test_train_classifier_multi_remat_matches_plain():
    """remat_chunk changes HBM use, not math: the trained params must match
    the plain path to float32 tolerance."""
    import jax

    from ae_waveforms_tpu.classify.dl import train_classifier_multi

    rng = np.random.default_rng(7)
    S, n, m, T = 2, 32, 12, 48
    Xs = rng.standard_normal((S, n, T, 1)).astype(np.float32)
    ys = (rng.uniform(size=(S, n)) > 0.5).astype(np.float32)
    Xvs = rng.standard_normal((S, m, T, 1)).astype(np.float32)
    yvs = np.tile([0.0, 1.0], (S, m // 2)).astype(np.float32)

    kw = dict(seeds=[0, 1], num_epochs=2, batch_size=16)
    plain = train_classifier_multi(Xs, ys, Xvs, yvs, **kw)
    remat = train_classifier_multi(Xs, ys, Xvs, yvs, remat_chunk=16, **kw)
    # the per-chunk input projection groups f32 matmul reductions differently
    # from the whole-sequence one; the ~1e-7 per-step noise compounds through
    # Adam's normalised updates, so tolerance is f32-training-scale
    for s in range(S):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4),
            plain[s][0], remat[s][0],
        )

def test_max_seed_chunk_split_is_exact():
    """The per-device seed-axis cap (the TPU crash guard, classify/dl.py
    DL_TPU_SEED_CHUNK) splits a wide call into balanced sequential groups;
    per-seed rng streams are keyed by seed, so results must match the
    unsplit call to f32 tolerance (the vmap width changes XLA's reduction
    scheduling, not the math), for both return forms."""
    import jax
    from ae_waveforms_tpu.classify.dl import train_classifier_multi

    rng = np.random.default_rng(2)
    S, n, m = 5, 32, 12
    Xs = rng.standard_normal((S, n, 64, 1)).astype(np.float32)
    ys = (rng.uniform(size=(S, n)) > 0.5).astype(np.float32)
    Xvs = rng.standard_normal((S, m, 64, 1)).astype(np.float32)
    yvs = np.tile([0.0, 1.0], (S, m // 2))
    kw = dict(seeds=[0, 1, 2, 3, 4], num_epochs=2, batch_size=16)

    whole = train_classifier_multi(Xs, ys, Xvs, yvs, **kw)
    split = train_classifier_multi(Xs, ys, Xvs, yvs, max_seed_chunk=2, **kw)
    assert len(split) == S
    close = lambda a, b: np.testing.assert_allclose(  # noqa: E731
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    for (pw, sw), (ps, ss) in zip(whole, split):
        for a, b in zip(jax.tree_util.tree_leaves(pw), jax.tree_util.tree_leaves(ps)):
            close(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(sw), jax.tree_util.tree_leaves(ss)):
            close(a, b)

    stacked_p, stacked_s = train_classifier_multi(
        Xs, ys, Xvs, yvs, max_seed_chunk=2, return_stacked=True, **kw
    )
    assert jax.tree_util.tree_leaves(stacked_p)[0].shape[0] == S
    for i, (pw, _sw) in enumerate(whole):
        got = jax.tree_util.tree_map(lambda a: np.asarray(a[i]), stacked_p)
        for a, b in zip(jax.tree_util.tree_leaves(pw), jax.tree_util.tree_leaves(got)):
            close(a, b)
