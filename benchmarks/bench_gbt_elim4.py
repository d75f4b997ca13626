"""Fourth-stage GBT elimination at the SHIPPED sweep shape (S=96 fit
chunks): where does the non-histogram residual sit, stage by stage?

VERDICT r4 #8: "fuse the gain/argmax epilogue into the Pallas kernel, or
publish the per-stage breakdown proving the residual is MXU-irreducible".
This bench isolates each scan-body stage with a cheap stand-in (upstream
stages kept live via *0 data dependencies so XLA cannot DCE them):

  full        — the shipped scan body (hist backend as given)
  fake_hist   — histogram build replaced by zeros (isolates the
                per-level histogram matmul / Pallas kernel)
  fake_gain   — prefix-sum (tri matmul) + gain + argmax replaced by a
                constant split choice (isolates the per-level epilogue
                the fusion idea would absorb)
  fake_route  — routing replaced by node_of = 2*node_of (drops the
                node-one-hot + C-contraction + compare chain)
  fake_leaf   — leaf one-hot + leaf matmuls replaced by a constant
                margin bump

full - fake_X bounds what fusing stage X into a kernel could save.
Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/bench_gbt_elim4.py [xla|pallas]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ae_waveforms_tpu.core.runtime import enable_compilation_cache
from ae_waveforms_tpu.ops.gbt_hist_pallas import left_histograms, onehot_int8

S, N, F, BINS, DEPTH, TREES = 96, 12500, 10, 64, 6, 50
LAMBDA = 1.0
HIST = sys.argv[1] if len(sys.argv) > 1 else "pallas"

enable_compilation_cache()
rng = np.random.default_rng(0)
bins_np = rng.integers(0, BINS, size=(N, F)).astype(np.int32)
bins_g = jnp.asarray(bins_np)
y_g = jnp.asarray((rng.standard_normal(N) > 0).astype(np.float32))
bins_f = bins_g.astype(jnp.float32)
tri = jnp.triu(jnp.ones((BINS, BINS), jnp.float32))
oh_i8 = onehot_int8(bins_g, BINS)
onehot_f = (bins_g[:, :, None] == jnp.arange(BINS)[None, None, :]).astype(
    jnp.float32).reshape(N, F * BINS)


def make(fake_hist=False, fake_gain=False, fake_route=False, fake_leaf=False,
         route_gather=False):
    def grow_tree(margin, inp):
        _, key = inp
        k_row, _ = jax.random.split(key)
        sub = (jax.random.uniform(k_row, (N,)) < 0.9).astype(jnp.float32)
        p = jax.nn.sigmoid(margin)
        g = (p - y_g) * sub
        h = jnp.maximum(p * (1.0 - p), 1e-16) * sub

        node_of = jnp.zeros((N,), jnp.int32)
        parentG = parentH = None
        for depth in range(DEPTH):
            n_nodes = 2 ** depth
            half = max(n_nodes // 2, 1)
            if fake_hist:
                GH = jnp.zeros((2 * half if depth else 2, F * BINS)) + g.sum() * 0
            elif HIST == "pallas":
                GH = left_histograms(oh_i8, g, h, node_of, half=half, n_bins=BINS)
            else:
                sel = jax.nn.one_hot(node_of, n_nodes, dtype=jnp.float32)[:, 0::2] \
                    if depth else jnp.ones((N, 1), jnp.float32)
                A = jnp.concatenate([sel * g[:, None], sel * h[:, None]], axis=1)
                GH = A.T @ onehot_f
            if depth == 0:
                Gh = GH[:1].reshape(1, F, BINS); Hh = GH[1:].reshape(1, F, BINS)
            else:
                Gl = GH[:half].reshape(half, F, BINS); Hl = GH[half:].reshape(half, F, BINS)
                Gh = jnp.stack([Gl, parentG - Gl], 1).reshape(n_nodes, F, BINS)
                Hh = jnp.stack([Hl, parentH - Hl], 1).reshape(n_nodes, F, BINS)
            parentG, parentH = Gh, Hh

            if fake_gain:
                live = (Gh[:, 0, 0] * 0).astype(jnp.int32)  # keep hist live
                bf = live + (depth % F)
                bb = live + BINS // 2
                do_split = live < 1
            else:
                GL = Gh @ tri; HL = Hh @ tri
                G = GL[:, :, -1:]; H = HL[:, :, -1:]
                gain = 0.5 * (GL**2 / (HL + LAMBDA)
                              + (G - GL)**2 / (H - HL + LAMBDA)
                              - G**2 / (H + LAMBDA))
                flat = gain.reshape(n_nodes, F * BINS)
                best = jnp.argmax(flat, axis=1)
                do_split = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0] > 0.0
                bf = (best // BINS).astype(jnp.int32)
                bb = (best % BINS).astype(jnp.int32)

            if fake_route:
                node_of = 2 * node_of + (bf.sum() * 0).astype(jnp.int32)
            elif route_gather:
                # candidate replacement: per-row gathers of the node's
                # split instead of the one-hot contraction — O(S*n)
                # intermediates instead of O(S*n*n_nodes)
                sel_f = jnp.take(bf, node_of)
                sel_b = jnp.take(bb, node_of)
                can = jnp.take(do_split, node_of)
                rowbin = jnp.take_along_axis(
                    bins_g, sel_f[:, None], axis=1)[:, 0]
                go_right = (rowbin > sel_b).astype(jnp.int32)
                node_of = jnp.where(can, 2 * node_of + go_right, 2 * node_of)
            else:
                node_onehot = jax.nn.one_hot(node_of, n_nodes, dtype=jnp.float32)
                feat_oh = jax.nn.one_hot(bf, F, dtype=jnp.float32)
                C = bins_f @ feat_oh.T
                right = (C > bb[None, :].astype(jnp.float32) + 0.5).astype(jnp.float32)
                go_right = (jnp.sum(node_onehot * right, axis=1) > 0.5).astype(jnp.int32)
                splittable = (node_onehot @ do_split.astype(jnp.float32)) > 0.5
                node_of = jnp.where(splittable, 2 * node_of + go_right, 2 * node_of)

        if fake_leaf:
            margin = margin + 1e-6 * (g + node_of.astype(jnp.float32) * 1e-9)
        else:
            leaf_onehot = jax.nn.one_hot(node_of, 2 ** DEPTH, dtype=jnp.float32)
            Gl_ = leaf_onehot.T @ g
            Hl_ = leaf_onehot.T @ h
            wleaf = -Gl_ / (Hl_ + LAMBDA)
            margin = margin + 0.3 * (leaf_onehot @ wleaf)
        return margin, None

    def run(margin0, keys):
        return jax.lax.scan(grow_tree, margin0, (jnp.arange(TREES), keys))[0]

    return jax.jit(jax.vmap(run))


margins0 = jnp.zeros((S, N), jnp.float32)
all_keys = jax.vmap(lambda s: jax.random.split(jax.random.PRNGKey(s), TREES))(
    jnp.arange(S, dtype=jnp.uint32))

results = {}
for name, cfg in [
    ("full", {}),
    ("fake_hist", dict(fake_hist=True)),
    ("fake_gain", dict(fake_gain=True)),
    ("fake_route", dict(fake_route=True)),
    ("route_gather", dict(route_gather=True)),
    ("fake_leaf", dict(fake_leaf=True)),
]:
    fn = make(**cfg)
    np.asarray(fn(margins0, all_keys))  # compile + warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(margins0, all_keys))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[2]
    results[name] = med
    print(f"hist={HIST:6s} S={S} {name:10s} {1e3 * med / TREES:7.3f} ms/tree "
          f"(spread {min(times):.3f}-{max(times):.3f} s)", flush=True)

full = results["full"]
for name in ("fake_hist", "fake_gain", "fake_route", "fake_leaf"):
    save = full - results[name]
    print(f"stage {name[5:]:6s}: {1e3 * save / TREES:6.3f} ms/tree "
          f"({100 * save / full:4.1f}% of full)", flush=True)
