"""Histogram gradient-boosted trees in pure JAX — the TPU-native stand-in
for the XGBoost binary classifiers the reference trains thousands of times
(main_ae_classify.py, main_ml_classify.py, analysis_PPV_hypokalaemia.py).

TPU-first design
----------------
The classic CPU/GPU GBDT inner loop is a scatter-add histogram; scatters
serialise badly on TPU.  Here the per-level (node, feature, bin) gradient/
hessian histograms are *matmuls*: a static one-hot bin-indicator matrix
B (n, F*bins) is built once per dataset, and each level computes

    [G; H] = [node_onehot*g, node_onehot*h]^T @ B   # one MXU matmul

so the entire tree-growing pass is systolic-array work.  Level-wise growth
with fixed shapes (2^depth nodes), logistic loss, second-order gains with
L2 lambda, gamma pruning, min_child_weight, per-tree row subsampling and
column subsampling — the same knob set the reference's LHS sweep searches
over.  Trees are grown under ``lax.scan``; the whole fit is one compiled
program, and fits vmap over the 25-seed evaluation harness.

Scan-body rules learned by on-chip elimination benchmarking
(benchmarks/bench_gbt_elim.py / bench_gbt_v2.py, 62.5 -> 4.3 ms/tree at
harness scale, n=12500 F=10 bins=256 depth=6, 24-fit chunks):

* NO per-row gathers.  ``take_along_axis`` row-routing cost ~58 of the
  62.5 ms/tree (~30M elem/s effective).  Every gather is re-expressed as a
  one-hot contraction: a row's split-feature value is ``bins_f32 @
  onehot(feat_per_node)^T`` picked by the node one-hot — MXU work.
* NO ``jnp.cumsum`` over the bin axis.  XLA lowers it as an O(W*N)
  reduce_window on the VPU (~8.7 ms/tree); a (bins, bins) upper-triangular
  matmul computes the same prefix sums on the MXU in ~0.1 ms.
* NO scatters for heap bookkeeping.  Levels occupy static, contiguous
  heap ranges [2^d-1, 2^(d+1)-1), so per-level results are concatenated —
  fully static layout.
* Sibling subtraction: only left-child histograms are computed
  (right = parent - left), halving histogram matmul FLOPs; exact for
  masked/empty nodes too (empty right child -> all-infeasible gains).

This is a capability equivalent (same algorithm family and hyperparameters,
comparable accuracy), not a bit-clone of the XGBoost C++ core — which is a
consumed third-party dependency in the reference, not reference code.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ae_waveforms_tpu.ops.gbt_hist_pallas import (
    hist_vmem_feasible,
    left_histograms,
    onehot_int8,
)
from ae_waveforms_tpu.ops.gbt_route_pallas import route_rows

__all__ = ["GBTClassifier", "fit_gbt", "predict_margin"]

N_BINS = 64
LAMBDA = 1.0  # xgboost reg_lambda default
BASE_SCORE = 0.0  # margin of base_score 0.5


def _max_pallas_levels(fit_axis: int, fb: int, max_depth: int) -> int:
    """Number of leading tree levels whose fused-kernel accumulator fits the
    VMEM envelope: level ``d`` computes ``max(2^(d-1), 1)`` left children, so
    feasibility is monotone in ``d`` and the count is the first infeasible
    level index (``max_depth`` when every level fits)."""
    for d in range(max_depth):
        if not hist_vmem_feasible(fit_axis, max(2 ** (d - 1), 1), fb):
            return d
    return max_depth


def _resolve_hist_impl(
    hist_impl: Optional[str], fb: int, fit_axis: int = 1, max_depth: int = 6
) -> str:
    """Histogram backend for the tree scan: "pallas" (fused VMEM kernel,
    ops/gbt_hist_pallas.py), "xla" (batched one-hot matmul), or "mixed:<K>"
    (pallas for levels ``depth < K``, xla for the deeper levels; see
    BENCHMARKS.md "Mixed per-level histogram backend" for the on-chip
    measurement that decides whether auto ever picks it).  ``None``
    reads AE_GBT_HIST (auto/pallas/xla/mixed:<K>); "pallas_interpret" forces
    the interpreter (CPU-backed oracle tests).

    auto picks pallas on TPU when (a) the one-hot width ``fb = F * n_bins``
    is narrow enough that the VMEM-resident accumulator leaves room for
    large row tiles (measured crossover ~1024 on v5e,
    benchmarks/bench_gbt_pallas.py: at F*n_bins=640 the kernel wins and its
    lead grows with the fit-chunk size — XLA's A-operand HBM traffic scales
    with S, the kernel's VMEM build does not
    (benchmarks/bench_gbt_chunk_scaling.py) — at 2560 the shrunken tiles
    lose to XLA's matmul), AND (b) the DEEPEST tree level's accumulator
    (rows = fit_axis * 2^(max_depth-1)) still fits the kernel's measured
    VMEM envelope: a depth-10 sweep at 96-fit chunks would need a ~126 MiB
    accumulator, which Mosaic rejects — such programs route to XLA whole
    (``hist_vmem_feasible``).  CPU resolves to xla (the kernel would run
    interpreted).

    Callers that know the vmapped fit-axis size (the sweep/multi entry
    points) must pass it; resolution happens OUTSIDE the jit boundary so the
    compilation cache is keyed on the concrete backend — an AE_GBT_HIST
    change mid-process therefore takes effect on the next call, not only on
    the next uncompiled shape."""
    if hist_impl is None:
        hist_impl = os.environ.get("AE_GBT_HIST", "auto")
    if hist_impl == "auto":
        worst_half = max(2 ** max(max_depth - 2, 0), 1)
        ok = (
            jax.default_backend() == "tpu"
            and fb <= 1024
            and hist_vmem_feasible(fit_axis, worst_half, fb)
        )
        return "pallas" if ok else "xla"
    if hist_impl.startswith(("mixed:", "mixed_interpret:")):
        prefix, _, k = hist_impl.partition(":")
        k = int(k)
        if k <= 0:
            return "xla"
        if k >= max_depth:
            return "pallas" if prefix == "mixed" else "pallas_interpret"
        return f"{prefix}:{k}"
    assert hist_impl in ("pallas", "xla", "pallas_interpret"), hist_impl
    return hist_impl


class GBTEnsemble(NamedTuple):
    feat: jnp.ndarray  # (T, max_nodes) int32 split feature per internal node
    thresh: jnp.ndarray  # (T, max_nodes) int32 split bin (go left if bin <= thresh)
    is_split: jnp.ndarray  # (T, max_nodes) bool
    leaf: jnp.ndarray  # (T, 2 * max_nodes) leaf weights indexed by final node id
    lr: jnp.ndarray  # scalar learning rate


def compute_bin_edges(X: np.ndarray, n_bins: int = N_BINS) -> np.ndarray:
    """Per-feature quantile bin edges, (F, n_bins - 1)."""
    qs = np.linspace(0, 1, n_bins + 1)[1:-1]
    return np.quantile(X, qs, axis=0).T.astype(np.float32)


def bin_data(X: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """(n, F) -> int32 bin ids via searchsorted per feature."""
    n, F = X.shape
    out = np.empty((n, F), np.int32)
    for f in range(F):
        out[:, f] = np.searchsorted(edges[f], X[:, f], side="right")
    return out


def _fit_gbt_margins(
    bins: jnp.ndarray,  # (n, F) int32 pre-binned features
    y: jnp.ndarray,  # (n,) float32 in {0, 1}
    row_weight: jnp.ndarray,  # (n,) float32 0/1 mask (training subset selection)
    rng: jnp.ndarray,
    max_depth: int = 6,
    n_estimators: int = 100,
    learning_rate: float = 0.3,
    gamma: float = 0.0,
    min_child_weight: float = 1.0,
    subsample: float = 1.0,
    colsample_bytree: float = 1.0,
    n_bins: int = N_BINS,
    n_active=None,
    depth_limit=None,
    hist_impl: Optional[str] = None,
):
    """Fit returning ``(ensemble, final_margin)``.  The boosting carry holds
    the margins of EVERY pool row (held-out rows route through the trees
    even though their gradients carry zero weight), so the final carry
    equals ``predict_margin(ens, bins)`` — callers that score on the same
    pool (e.g. CV grid search) can skip the full re-traversal.

    ``n_active`` (traced, defaults to n_estimators) masks trees beyond it
    to no-ops: a hyperparameter sweep can fix ``n_estimators`` at the grid
    cap so one compilation per depth serves every candidate.

    ``depth_limit`` (traced, defaults to max_depth) masks splits at levels
    >= limit — a depth-L fit inside a max_depth-D program partitions rows
    identically to a native depth-L fit (unsplit rows descend the left
    spine), so hyperparameter sweeps can bucket depths coarsely and compile
    even fewer programs."""
    n, F = bins.shape
    # the gather-free routing contraction bins_f @ feat_oh.T runs through the
    # MXU, which on TPU defaults to bf16 inputs; bf16 represents integers
    # exactly only up to 256, so bin ids (< n_bins) must stay <= 256 or the
    # +0.5 threshold compare silently mis-routes rows
    assert n_bins <= 256, f"n_bins={n_bins} > 256 would corrupt bf16 MXU split routing"
    max_nodes = 2**max_depth
    if n_active is None:
        n_active = n_estimators
    n_active = jnp.asarray(n_active, jnp.int32)
    if depth_limit is None:
        depth_limit = max_depth
    depth_limit = jnp.asarray(depth_limit, jnp.int32)

    # fallback resolution for direct callers; the public entry points below
    # resolve BEFORE their jit boundary with the true vmapped fit-axis size
    hist_impl = _resolve_hist_impl(hist_impl, F * n_bins, 1, max_depth)
    # "mixed:<K>": the fused kernel serves levels depth < K (their VMEM
    # accumulators fit), XLA serves the deeper levels — per-level selection
    # is a Python decision over the unrolled depth loop, so each backend's
    # inputs are built only if some level uses it
    pallas_levels = (
        int(hist_impl.split(":", 1)[1])
        if hist_impl.startswith(("mixed:", "mixed_interpret:"))
        else 0 if hist_impl == "xla" else max_depth
    )
    kernel_interpret = hist_impl == "pallas_interpret" or hist_impl.startswith(
        "mixed_interpret:"
    )
    # AE_GBT_ROUTE=xla pins the XLA routing chain at every level (A/B
    # escape hatch for the fused routing kernel; decisions are
    # bit-identical either way).  Read at trace time: flips apply to the
    # next process / uncompiled shape, not to already-cached programs.
    route_pallas = os.environ.get("AE_GBT_ROUTE", "auto") != "xla"
    if pallas_levels < max_depth:
        # static one-hot bin indicators (n, F * n_bins) via direct iota
        # compare (cheaper to fuse than one_hot over shifted indices)
        onehot = (bins[:, :, None] == jnp.arange(n_bins)[None, None, :]).astype(
            jnp.float32
        ).reshape(n, F * n_bins)
    if pallas_levels > 0:
        # the Pallas kernel streams the one-hot as int8 (built once per
        # program, level-invariant) and fuses the A-operand construction
        onehot_i8 = onehot_int8(bins, n_bins)
    bins_f = bins.astype(jnp.float32)  # bin ids <= 256 are exact even as bf16 MXU inputs
    if pallas_levels > 0:
        # the routing kernel streams bins in their (F, n) natural-dot layout;
        # level-invariant, so XLA hoists the one transpose out of the scan
        binsT = bins_f.T
    # prefix sums over the bin axis as an MXU matmul (see module docstring)
    tri = jnp.triu(jnp.ones((n_bins, n_bins), jnp.float32))  # tri[i,j]=1 if i<=j

    lr = jnp.asarray(learning_rate, jnp.float32)
    gamma = jnp.asarray(gamma, jnp.float32)
    mcw = jnp.asarray(min_child_weight, jnp.float32)

    def grow_tree(carry, inp):
        tree_idx, key = inp
        margin = carry
        active = (tree_idx < n_active).astype(jnp.float32)
        k_row, k_col = jax.random.split(key)
        # subsample/colsample are traced scalars so one compilation serves
        # every LHS hyperparameter candidate; rate 1.0 degenerates to all-true
        sub = (jax.random.uniform(k_row, (n,)) < subsample).astype(jnp.float32)
        w = row_weight * sub
        col_mask = (jax.random.uniform(k_col, (F,)) < colsample_bytree).astype(jnp.float32)
        # guarantee at least one active column
        col_mask = jax.lax.cond(col_mask.sum() > 0, lambda m: m, lambda m: m.at[0].set(1.0), col_mask)

        p = jax.nn.sigmoid(margin)
        g = (p - y) * w
        h = jnp.maximum(p * (1.0 - p), 1e-16) * w

        node_of = jnp.zeros((n,), jnp.int32)
        feats, thrs, splits = [], [], []
        parentG = parentH = None

        for depth in range(max_depth):
            n_nodes = 2**depth
            node_onehot = jax.nn.one_hot(node_of, n_nodes, dtype=jnp.float32)
            half = max(n_nodes // 2, 1)
            if depth < pallas_levels:
                # fused VMEM kernel: both matmul operands built on-chip, no
                # per-level HBM intermediates (ops/gbt_hist_pallas.py); the
                # sweep's vmap axis folds into the kernel's column axis
                GH = left_histograms(
                    onehot_i8, g, h, node_of, half=half, n_bins=n_bins,
                    interpret=kernel_interpret,
                )
            elif depth == 0:
                # root histograms: one stacked MXU matmul for G and H
                A = jnp.concatenate([g[:, None], h[:, None]], axis=1)
                GH = A.T @ onehot
            else:
                # sibling subtraction: compute only left children (even node
                # ids); right = parent - left.  Rows of a non-split parent
                # all descend left, so the right child is empty and its
                # histogram is exactly parent - left = 0.
                left_sel = node_onehot[:, 0::2]  # (n, half)
                A = jnp.concatenate([left_sel * g[:, None], left_sel * h[:, None]], axis=1)
                GH = A.T @ onehot  # (2*half, F*n_bins)
            if depth == 0:
                # at the root the "left child" selector node_of == 0 matches
                # every row, so GH rows are the full G/H histograms
                Gh = GH[:1].reshape(1, F, n_bins)
                Hh = GH[1:].reshape(1, F, n_bins)
            else:
                Gl = GH[:half].reshape(half, F, n_bins)
                Hl = GH[half:].reshape(half, F, n_bins)
                Gh = jnp.stack([Gl, parentG - Gl], axis=1).reshape(n_nodes, F, n_bins)
                Hh = jnp.stack([Hl, parentH - Hl], axis=1).reshape(n_nodes, F, n_bins)
            parentG, parentH = Gh, Hh

            GL = Gh @ tri
            HL = Hh @ tri
            G = GL[:, :, -1:]
            H = HL[:, :, -1:]
            GR = G - GL
            HR = H - HL
            gain = 0.5 * (
                GL**2 / (HL + LAMBDA) + GR**2 / (HR + LAMBDA) - G**2 / (H + LAMBDA)
            ) - gamma
            feasible = (HL >= mcw) & (HR >= mcw) & (col_mask[None, :, None] > 0)
            # bin == n_bins-1 puts everything left: never a real split
            feasible = feasible & (jnp.arange(n_bins)[None, None, :] < n_bins - 1)
            gain = jnp.where(feasible, gain, -jnp.inf)

            flat = gain.reshape(n_nodes, F * n_bins)
            best = jnp.argmax(flat, axis=1)
            best_gain = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
            do_split = (best_gain > 0.0) & (depth < depth_limit)
            bf = (best // n_bins).astype(jnp.int32)
            bb = (best % n_bins).astype(jnp.int32)
            # heap layout: level d fills the static range [2^d-1, 2^(d+1)-1)
            feats.append(jnp.where(do_split, bf, 0))
            thrs.append(jnp.where(do_split, bb, 0))
            splits.append(do_split)

            # gather-free routing: each row's value of its node's split
            # feature is a one-hot contraction on the MXU
            if depth < pallas_levels and route_pallas:
                # fused VMEM routing kernel: the XLA chain's (S, n, n_nodes)
                # HBM intermediates were 40.1% of the scan body
                # (benchmarks/bench_gbt_elim4.py); decisions bit-identical
                node_of = route_rows(
                    binsT, node_of, bf, bb, do_split, n_nodes=n_nodes,
                    interpret=kernel_interpret,
                )
            else:
                feat_oh = jax.nn.one_hot(bf, F, dtype=jnp.float32)  # (n_nodes, F)
                C = bins_f @ feat_oh.T  # (n, n_nodes)
                right = (C > bb[None, :].astype(jnp.float32) + 0.5).astype(jnp.float32)
                go_right = (jnp.sum(node_onehot * right, axis=1) > 0.5).astype(jnp.int32)
                splittable = (node_onehot @ do_split.astype(jnp.float32)) > 0.5
                node_of = jnp.where(splittable, 2 * node_of + go_right, 2 * node_of)
            # rows in non-split nodes keep descending the left spine; their
            # histogram mass is self-consistent and their leaf is reached at
            # the bottom (classic fixed-shape trick: a dead node never splits
            # again because its gain is computed over the same rows)

        # leaf values from terminal assignment (up to 2^max_depth leaves)
        leaf_onehot = jax.nn.one_hot(node_of, max_nodes, dtype=jnp.float32)
        Gl = leaf_onehot.T @ g
        Hl = leaf_onehot.T @ h
        wleaf = (-Gl / (Hl + LAMBDA)) * active
        margin = margin + lr * (leaf_onehot @ wleaf)

        # static heap bookkeeping: concatenated levels occupy [0, 2^D-1),
        # padded by one inert slot to keep the (max_nodes,) layout
        feat_t = jnp.concatenate(feats + [jnp.zeros((1,), jnp.int32)])
        thr_t = jnp.concatenate(thrs + [jnp.zeros((1,), jnp.int32)])
        split_t = jnp.concatenate(splits + [jnp.zeros((1,), bool)])
        return margin, (feat_t, thr_t, split_t, wleaf)

    keys = jax.random.split(rng, n_estimators)
    margin0 = jnp.full((n,), BASE_SCORE, jnp.float32)
    final_margin, (feats, thrs, splits, leaves) = jax.lax.scan(
        grow_tree, margin0, (jnp.arange(n_estimators), keys)
    )
    ens = GBTEnsemble(feat=feats, thresh=thrs, is_split=splits, leaf=leaves, lr=lr)
    return ens, final_margin


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "n_estimators", "n_bins", "hist_impl"),
)
def _fit_gbt_jit(
    bins, y, row_weight, rng, max_depth, n_estimators, learning_rate,
    gamma, min_child_weight, subsample, colsample_bytree, n_bins,
    n_active, depth_limit, hist_impl,
) -> GBTEnsemble:
    return _fit_gbt_margins(
        bins, y, row_weight, rng, max_depth, n_estimators, learning_rate,
        gamma, min_child_weight, subsample, colsample_bytree, n_bins,
        n_active, depth_limit, hist_impl,
    )[0]


def fit_gbt(
    bins: jnp.ndarray,
    y: jnp.ndarray,
    row_weight: jnp.ndarray,
    rng: jnp.ndarray,
    max_depth: int = 6,
    n_estimators: int = 100,
    learning_rate: float = 0.3,
    gamma: float = 0.0,
    min_child_weight: float = 1.0,
    subsample: float = 1.0,
    colsample_bytree: float = 1.0,
    n_bins: int = N_BINS,
    n_active=None,
    depth_limit=None,
    hist_impl: Optional[str] = None,
) -> GBTEnsemble:
    """See ``_fit_gbt_margins`` — ensemble-only entry.  The histogram
    backend (AE_GBT_HIST override + auto policy) resolves here, OUTSIDE the
    jit boundary, so the compilation cache is keyed on the concrete
    backend.

    Do NOT wrap this (or ``_fit_gbt_margins``) in an external ``jax.vmap``:
    resolution here sees fit_axis=1, so the auto policy can pick the pallas
    kernel for a shape whose true vmapped accumulator is VMEM-infeasible —
    that surfaces as the kernel's trace-time ValueError rather than an
    auto-route to XLA.  Use ``fit_gbt_multi`` / ``fit_gbt_sweep``, whose
    resolution knows the real fit-axis size."""
    hist_impl = _resolve_hist_impl(
        hist_impl, bins.shape[1] * n_bins, 1, max_depth
    )
    return _fit_gbt_jit(
        bins, y, row_weight, rng, max_depth, n_estimators, learning_rate,
        gamma, min_child_weight, subsample, colsample_bytree, n_bins,
        n_active, depth_limit, hist_impl,
    )


@functools.partial(jax.jit, static_argnames=("max_depth",))
def predict_margin(ens: GBTEnsemble, bins: jnp.ndarray, max_depth: int) -> jnp.ndarray:
    n, F = bins.shape
    max_nodes = ens.leaf.shape[1]
    bins_f = bins.astype(jnp.float32)

    def one_tree(carry, tree):
        margin = carry
        feat_t, thr_t, split_t, wleaf = tree
        node_of = jnp.zeros((n,), jnp.int32)
        for depth in range(max_depth):
            n_nodes = 2**depth
            # level d's nodes live in the static heap range [2^d-1, 2^(d+1)-1)
            feat_lvl = jax.lax.slice(feat_t, [n_nodes - 1], [2 * n_nodes - 1])
            thr_lvl = jax.lax.slice(thr_t, [n_nodes - 1], [2 * n_nodes - 1])
            split_lvl = jax.lax.slice(split_t, [n_nodes - 1], [2 * n_nodes - 1])
            node_onehot = jax.nn.one_hot(node_of, n_nodes, dtype=jnp.float32)
            # gather-free: same one-hot contraction routing as the fit
            feat_oh = jax.nn.one_hot(feat_lvl, F, dtype=jnp.float32)
            C = bins_f @ feat_oh.T  # (n, n_nodes)
            right = (C > thr_lvl[None, :].astype(jnp.float32) + 0.5).astype(jnp.float32)
            go_right = (jnp.sum(node_onehot * right, axis=1) > 0.5).astype(jnp.int32)
            do = (node_onehot @ split_lvl.astype(jnp.float32)) > 0.5
            node_of = jnp.where(do, 2 * node_of + go_right, 2 * node_of)
        leaf_onehot = jax.nn.one_hot(node_of, max_nodes, dtype=jnp.float32)
        margin = margin + ens.lr * (leaf_onehot @ wleaf)
        return margin, None

    margin0 = jnp.full((n,), BASE_SCORE, jnp.float32)
    margin, _ = jax.lax.scan(one_tree, margin0, (ens.feat, ens.thresh, ens.is_split, ens.leaf))
    return margin


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "n_estimators", "n_bins", "hist_impl"),
)
def _fit_gbt_multi_jit(
    bins, y, row_weights, rngs, max_depth, n_estimators, learning_rate,
    gamma, min_child_weight, subsample, colsample_bytree, n_bins, hist_impl,
) -> GBTEnsemble:
    fit = lambda w, k: _fit_gbt_margins(
        bins, y, w, k,
        max_depth=max_depth, n_estimators=n_estimators, learning_rate=learning_rate,
        gamma=gamma, min_child_weight=min_child_weight, subsample=subsample,
        colsample_bytree=colsample_bytree, n_bins=n_bins, hist_impl=hist_impl,
    )[0]
    return jax.vmap(fit)(row_weights, rngs)


def fit_gbt_multi(
    bins: jnp.ndarray,  # (n, F) shared pre-binned pool
    y: jnp.ndarray,  # (n,)
    row_weights: jnp.ndarray,  # (S, n) per-seed selection masks
    rngs: jnp.ndarray,  # (S, 2) PRNG keys
    max_depth: int = 6,
    n_estimators: int = 100,
    learning_rate: float = 0.3,
    gamma: float = 0.0,
    min_child_weight: float = 1.0,
    subsample: float = 1.0,
    colsample_bytree: float = 1.0,
    n_bins: int = N_BINS,
    hist_impl: Optional[str] = None,
) -> GBTEnsemble:
    """All seeds of an evaluation sweep fitted in one device program.

    vmap over (row_weights, rngs): the shared one-hot bin matrix is traced
    once, and the per-level histograms become batched (S, nodes, n) x
    (n, F*bins) matmuls.  Binning uses the shared candidate pool's quantile
    edges (the per-seed training subsets are row-masks over the pool).  The
    histogram backend resolves here with the true fit-axis size: the fused
    Pallas kernel's VMEM accumulator scales with S * 2^depth, so deep-tree
    multi-fits route to XLA (see ``_resolve_hist_impl``)."""
    hist_impl = _resolve_hist_impl(
        hist_impl, bins.shape[1] * n_bins, row_weights.shape[0], max_depth
    )
    return _fit_gbt_multi_jit(
        bins, y, row_weights, rngs, max_depth, n_estimators, learning_rate,
        gamma, min_child_weight, subsample, colsample_bytree, n_bins, hist_impl,
    )


@functools.partial(jax.jit, static_argnames=("max_depth",))
def predict_margin_multi(ens: GBTEnsemble, bins: jnp.ndarray, max_depth: int) -> jnp.ndarray:
    """(S, ...) ensembles x shared test bins -> (S, n) margins."""
    return jax.vmap(lambda e: predict_margin(e, bins, max_depth))(ens)


@functools.partial(jax.jit, static_argnames=("max_depth", "n_estimators", "n_bins", "hist_impl", "with_margins"))
def _fit_gbt_sweep_jit(
    bins, y, row_weights, rngs, learning_rates, gammas, min_child_weights,
    subsamples, colsamples, n_actives, max_depth, n_estimators, n_bins,
    depth_limits, hist_impl, with_margins,
):
    if depth_limits is None:
        depth_limits = jnp.full(row_weights.shape[0], max_depth, jnp.int32)

    def one(w, k, lr, g, mcw, sub, col, n_act, dl):
        return _fit_gbt_margins(
            bins, y, w, k,
            max_depth=max_depth, n_estimators=n_estimators, learning_rate=lr,
            gamma=g, min_child_weight=mcw, subsample=sub, colsample_bytree=col,
            n_bins=n_bins, n_active=n_act, depth_limit=dl, hist_impl=hist_impl,
        )

    out = jax.vmap(one)(
        row_weights, rngs, learning_rates, gammas, min_child_weights, subsamples, colsamples,
        n_actives, depth_limits,
    )
    return out if with_margins else out[0]


def fit_gbt_sweep(
    bins: jnp.ndarray,  # (n, F) shared pre-binned pool
    y: jnp.ndarray,  # (n,)
    row_weights: jnp.ndarray,  # (S, n) per-fit row masks
    rngs: jnp.ndarray,  # (S, 2)
    learning_rates: jnp.ndarray,  # (S,)
    gammas: jnp.ndarray,  # (S,)
    min_child_weights: jnp.ndarray,  # (S,)
    subsamples: jnp.ndarray,  # (S,)
    colsamples: jnp.ndarray,  # (S,)
    n_actives: jnp.ndarray,  # (S,) int32
    max_depth: int,
    n_estimators: int,
    n_bins: int = N_BINS,
    depth_limits: jnp.ndarray = None,  # (S,) int32, defaults to max_depth
    hist_impl: Optional[str] = None,
) -> GBTEnsemble:
    """Hyperparameter-sweep fit: every continuous hyperparameter (and, via
    ``depth_limits``, the effective tree depth) is traced, so one compilation
    per (depth bucket, tree cap) serves the whole LHS grid — candidates x CV
    folds all fit in a single vmapped device program.  The histogram backend
    resolves here with the true fit-chunk size S (deep-depth buckets route
    to XLA — the Pallas accumulator would not fit VMEM at S * 2^depth rows)."""
    hist_impl = _resolve_hist_impl(
        hist_impl, bins.shape[1] * n_bins, row_weights.shape[0], max_depth
    )
    return _fit_gbt_sweep_jit(
        bins, y, row_weights, rngs, learning_rates, gammas, min_child_weights,
        subsamples, colsamples, n_actives, max_depth, n_estimators, n_bins,
        depth_limits, hist_impl, False,
    )


def fit_gbt_sweep_margins(
    bins, y, row_weights, rngs, learning_rates, gammas, min_child_weights,
    subsamples, colsamples, n_actives, max_depth: int, n_estimators: int,
    n_bins: int = N_BINS, depth_limits: jnp.ndarray = None,
    hist_impl: Optional[str] = None,
):
    """``fit_gbt_sweep`` that also returns the (S, n) final pool margins the
    boosting carry already holds (== predict_margin_multi on the same pool),
    so CV scoring needs no second tree traversal."""
    hist_impl = _resolve_hist_impl(
        hist_impl, bins.shape[1] * n_bins, row_weights.shape[0], max_depth
    )
    return _fit_gbt_sweep_jit(
        bins, y, row_weights, rngs, learning_rates, gammas, min_child_weights,
        subsamples, colsamples, n_actives, max_depth, n_estimators, n_bins,
        depth_limits, hist_impl, True,
    )


class GBTClassifier:
    """sklearn/xgboost-style wrapper over the jitted kernels."""

    def __init__(
        self,
        max_depth: int = 6,
        learning_rate: float = 0.3,
        n_estimators: int = 100,
        gamma: float = 0.0,
        min_child_weight: float = 1.0,
        subsample: float = 1.0,
        colsample_bytree: float = 1.0,
        random_state: int = 0,
        n_bins: int = N_BINS,
        n_estimators_cap: Optional[int] = None,
        **_ignored,
    ):
        # n_estimators_cap: compile with a fixed tree budget and mask the
        # rest (one compilation per depth across a hyperparameter sweep)
        self.n_estimators_cap = n_estimators_cap
        self.params = dict(
            max_depth=int(max_depth),
            learning_rate=float(learning_rate),
            n_estimators=int(n_estimators),
            gamma=float(gamma),
            min_child_weight=float(min_child_weight),
            subsample=float(subsample),
            colsample_bytree=float(colsample_bytree),
        )
        self.random_state = int(random_state)
        self.n_bins = n_bins
        self._ens = None
        self._edges = None

    def fit(self, X: np.ndarray, y: np.ndarray, sample_weight: Optional[np.ndarray] = None):
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32)
        self._edges = compute_bin_edges(X, self.n_bins)
        bins = jnp.asarray(bin_data(X, self._edges))
        w = jnp.asarray(
            np.ones(len(y), np.float32) if sample_weight is None else np.asarray(sample_weight, np.float32)
        )
        p = self.params
        cap = self.n_estimators_cap or p["n_estimators"]
        self._ens = fit_gbt(
            bins,
            jnp.asarray(y),
            w,
            jax.random.PRNGKey(self.random_state),
            max_depth=p["max_depth"],
            n_estimators=cap,
            learning_rate=p["learning_rate"],
            gamma=p["gamma"],
            min_child_weight=p["min_child_weight"],
            subsample=p["subsample"],
            colsample_bytree=p["colsample_bytree"],
            n_bins=self.n_bins,
            n_active=min(p["n_estimators"], cap),
        )
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        bins = jnp.asarray(bin_data(np.asarray(X, np.float32), self._edges))
        m = np.asarray(predict_margin(self._ens, bins, self.params["max_depth"]))
        p1 = 1.0 / (1.0 + np.exp(-m))
        return np.stack([1 - p1, p1], axis=1)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X)[:, 1] >= 0.5).astype(int)

    def get_params(self, deep=True):
        return {**self.params, "random_state": self.random_state}

    def set_params(self, **kw):
        for k, v in kw.items():
            if k == "random_state":
                self.random_state = int(v)
            elif k in self.params:
                self.params[k] = v
        return self
