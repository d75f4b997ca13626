"""Oracle tests for the fused Pallas GBT histogram kernel.

The kernel (ops/gbt_hist_pallas.py) must reproduce the XLA one-hot-matmul
histograms exactly at float32 precision, and the full tree fit driven
through ``hist_impl="pallas_interpret"`` must grow identical trees to the
shipped XLA path — interpret mode runs the same kernel logic on the CPU
backend, so these tests pin the kernel's math without a TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ae_waveforms_tpu.classify.gbt import (
    _fit_gbt_margins,
    bin_data,
    compute_bin_edges,
    fit_gbt_sweep_margins,
)
from ae_waveforms_tpu.ops.gbt_hist_pallas import (
    left_histograms,
    left_histograms_xla,
    onehot_int8,
)


@pytest.mark.parametrize("half,n_bins", [(1, 64), (8, 64), (16, 32), (4, 256)])
def test_left_histograms_matches_xla(half, n_bins):
    rng = np.random.default_rng(half * 1000 + n_bins)
    S, n, F = 5, 700, 10
    bins = jnp.asarray(rng.integers(0, n_bins, size=(n, F)).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((S, n)).astype(np.float32))
    h = jnp.asarray(rng.uniform(0, 1, (S, n)).astype(np.float32))
    node = jnp.asarray(rng.integers(0, 2 * half, size=(S, n)).astype(np.int32))

    ref = left_histograms_xla(bins, g, h, node, half=half, n_bins=n_bins)
    oh8 = onehot_int8(bins, n_bins)
    got = jax.vmap(
        lambda gg, hh, nn: left_histograms(
            oh8, gg, hh, nn, half=half, n_bins=n_bins,
            interpret=True, precision="float32",
        )
    )(g, h, node)
    np.testing.assert_allclose(
        np.asarray(got.reshape(ref.shape)), np.asarray(ref), atol=1e-4, rtol=1e-5
    )

    # unbatched call (the custom_vmap primal path, S=1 internally)
    one = left_histograms(
        oh8, g[0], h[0], node[0], half=half, n_bins=n_bins,
        interpret=True, precision="float32",
    )
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref[0]), atol=1e-4)


def _task(n=900, F=10, n_bins=64, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, F)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.standard_normal(n) > 0).astype(
        np.float32
    )
    bins = jnp.asarray(bin_data(X, compute_bin_edges(X, n_bins)))
    return bins, jnp.asarray(y), rng


def test_fit_margins_pallas_matches_xla():
    bins, y, rng = _task()
    w = jnp.asarray((rng.uniform(size=y.shape) > 0.3).astype(np.float32))
    key = jax.random.PRNGKey(3)
    kw = dict(max_depth=4, n_estimators=12, learning_rate=0.2,
              subsample=0.9, colsample_bytree=0.9, n_bins=64)
    ens_x, m_x = _fit_gbt_margins(bins, y, w, key, hist_impl="xla", **kw)
    ens_p, m_p = _fit_gbt_margins(bins, y, w, key, hist_impl="pallas_interpret", **kw)
    # identical split structure: no histogram perturbation flipped a split
    assert bool((ens_x.feat == ens_p.feat).all())
    assert bool((ens_x.thresh == ens_p.thresh).all())
    assert bool((ens_x.is_split == ens_p.is_split).all())
    np.testing.assert_allclose(np.asarray(m_x), np.asarray(m_p), atol=5e-3)


def test_sweep_margins_pallas_matches_xla():
    bins, y, rng = _task()
    S = 3
    ws = jnp.asarray((rng.uniform(size=(S,) + y.shape) > 0.3).astype(np.float32))
    ks = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))

    def sweep(hist_impl):
        return fit_gbt_sweep_margins(
            bins, y, ws, ks,
            jnp.full(S, 0.2), jnp.zeros(S), jnp.ones(S),
            jnp.full(S, 0.9), jnp.full(S, 0.9), jnp.full(S, 12, jnp.int32),
            max_depth=4, n_estimators=12, n_bins=64, hist_impl=hist_impl,
        )[1]

    np.testing.assert_allclose(
        np.asarray(sweep("xla")), np.asarray(sweep("pallas_interpret")), atol=5e-3
    )


def test_vmem_feasibility_model():
    """The feasibility model must admit the measured-win envelope and reject
    the shapes the chip rejects (both probed on v5e: S=96/half=16/FB=640
    compiles at ~15.7 MB modelled, half=32 is refused by Mosaic)."""
    from ae_waveforms_tpu.ops.gbt_hist_pallas import hist_vmem_feasible

    assert hist_vmem_feasible(96, 16, 640)  # shipped 96-fit depth-6 sweep
    assert hist_vmem_feasible(1, 256, 640)  # single fit, depth 10
    assert not hist_vmem_feasible(96, 32, 640)  # depth-7 bucket at 96 fits
    assert not hist_vmem_feasible(96, 256, 640)  # depth-10 bucket at 96 fits
    assert not hist_vmem_feasible(25, 256, 640)  # 25-seed eval, depth 10


def test_auto_policy_rejects_vmem_infeasible_depths(monkeypatch):
    """auto on TPU picks pallas only when the DEEPEST level fits the kernel's
    VMEM envelope; a depth-10 sweep at 96-fit chunks (the production grid
    search's deep bucket) must route to XLA instead of crashing Mosaic."""
    from ae_waveforms_tpu.classify.gbt import _resolve_hist_impl

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("AE_GBT_HIST", raising=False)
    assert _resolve_hist_impl(None, 640, 96, 6) == "pallas"
    assert _resolve_hist_impl(None, 640, 96, 10) == "xla"
    assert _resolve_hist_impl(None, 640, 25, 10) == "xla"
    assert _resolve_hist_impl(None, 640, 1, 10) == "pallas"
    assert _resolve_hist_impl(None, 2560, 1, 6) == "xla"  # fb crossover
    # the env override beats auto and is resolved OUTSIDE the jit boundary
    # (public entry points key their compilation cache on the result)
    monkeypatch.setenv("AE_GBT_HIST", "xla")
    assert _resolve_hist_impl(None, 640, 96, 6) == "xla"


def test_kernel_raises_clearly_beyond_vmem():
    """Forcing the kernel onto a VMEM-infeasible shape must raise an
    actionable ValueError at trace time, not an opaque Mosaic error at
    compile time."""
    from ae_waveforms_tpu.ops.gbt_hist_pallas import _left_hist_batched

    S, n, F, n_bins, half = 96, 256, 10, 64, 256
    rng = np.random.default_rng(0)
    oh = onehot_int8(
        jnp.asarray(rng.integers(0, n_bins, (n, F)).astype(np.int32)), n_bins
    )
    g = jnp.zeros((S, n), jnp.float32)
    node = jnp.zeros((S, n), jnp.int32)
    with pytest.raises(ValueError, match="VMEM"):
        _left_hist_batched(oh, g, g, node, half=half, n_bins=n_bins)
    # the interpreter oracle has no VMEM: same shape must still run there
    out = _left_hist_batched(
        oh, g, g, node, half=half, n_bins=n_bins,
        interpret=True, precision="float32",
    )
    assert out.shape == (S, 2 * half, F * n_bins)


def test_fit_margins_mixed_matches_xla():
    """mixed:<K> runs the fused kernel on levels depth < K and XLA on the
    rest; tree structure and margins must match the pure paths."""
    bins, y, rng = _task()
    w = jnp.asarray((rng.uniform(size=y.shape) > 0.3).astype(np.float32))
    key = jax.random.PRNGKey(3)
    kw = dict(max_depth=4, n_estimators=12, learning_rate=0.2,
              subsample=0.9, colsample_bytree=0.9, n_bins=64)
    ens_x, m_x = _fit_gbt_margins(bins, y, w, key, hist_impl="xla", **kw)
    ens_m, m_m = _fit_gbt_margins(
        bins, y, w, key, hist_impl="mixed_interpret:2", **kw
    )
    assert bool((ens_x.feat == ens_m.feat).all())
    assert bool((ens_x.thresh == ens_m.thresh).all())
    assert bool((ens_x.is_split == ens_m.is_split).all())
    np.testing.assert_allclose(np.asarray(m_x), np.asarray(m_m), atol=5e-3)


def test_resolve_mixed_levels():
    """mixed:<K> resolution: degenerate K collapses to the pure backends."""
    from ae_waveforms_tpu.classify.gbt import _max_pallas_levels, _resolve_hist_impl

    assert _resolve_hist_impl("mixed:0", 640, 96, 10) == "xla"
    assert _resolve_hist_impl("mixed:10", 640, 96, 10) == "pallas"
    assert _resolve_hist_impl("mixed:6", 640, 96, 10) == "mixed:6"
    assert _resolve_hist_impl("mixed_interpret:4", 640, 96, 10) == "mixed_interpret:4"
    assert _resolve_hist_impl("mixed_interpret:12", 640, 96, 10) == "pallas_interpret"
    # the VMEM envelope admits exactly the shallow levels of a deep 96-fit
    # program (calibration pinned by test_vmem_feasibility_model)
    assert _max_pallas_levels(96, 640, 10) == 6
    assert _max_pallas_levels(96, 640, 6) == 6
    assert _max_pallas_levels(1, 640, 10) == 10
