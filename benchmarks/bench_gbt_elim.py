"""Elimination benchmark for the GBT tree-grow scan body.

Round-1 measured 62.5 ms/tree per 24-fit chunk at harness scale
(n=12500, F=10, bins=256, depth 6), with the histogram matmuls accounting
for only ~6 ms.  This script times stripped-down variants of the scan body
on the real chip to isolate which auxiliary op eats the remaining ~56 ms:

  full        — the real grow_tree (as in classify/gbt.py)
  hist_only   — histograms + cumsum/gain/argmax, but fixed routing (no
                take_along_axis / no scatters / no RNG)
  no_gain     — histograms only, fixed split choice (no cumsum/argmax)
  no_rng      — full minus the per-tree jax.random.uniform subsample draws
  no_scatter  — full minus the .at[].set heap bookkeeping
  no_route    — full minus the row-routing gathers (node_of fixed walk)

Each variant is a lax.scan over T trees inside one jit; timed warm with an
np.asarray sync (axon block_until_ready does not block).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

S, N, F, BINS, DEPTH, TREES = 24, 12500, 10, 256, 6, 20
MAX_NODES = 2**DEPTH
LAMBDA = 1.0


def make_variant(name: str):
    use_rng = name not in ("no_rng", "hist_only", "no_gain")
    use_gain = name not in ("no_gain",)
    use_scatter = name not in ("no_scatter", "hist_only", "no_gain")
    use_route = name not in ("no_route", "hist_only", "no_gain")

    def grow_tree(carry, inp):
        margin = carry
        tree_idx, key = inp
        if use_rng:
            k_row, _ = jax.random.split(key)
            sub = (jax.random.uniform(k_row, (N,)) < 0.9).astype(jnp.float32)
        else:
            sub = 1.0
        p = jax.nn.sigmoid(margin)
        g = (p - y_g) * sub
        h = jnp.maximum(p * (1.0 - p), 1e-16) * sub

        node_of = jnp.zeros((N,), jnp.int32)
        feat_t = jnp.zeros((MAX_NODES,), jnp.int32)
        thr_t = jnp.zeros((MAX_NODES,), jnp.int32)
        split_t = jnp.zeros((MAX_NODES,), bool)

        for depth in range(DEPTH):
            n_nodes = 2**depth
            node_onehot = jax.nn.one_hot(node_of, n_nodes, dtype=jnp.float32)
            Gh = (node_onehot * g[:, None]).T @ onehot_g
            Hh = (node_onehot * h[:, None]).T @ onehot_g
            Gh = Gh.reshape(n_nodes, F, BINS)
            Hh = Hh.reshape(n_nodes, F, BINS)
            if use_gain:
                GL = jnp.cumsum(Gh, axis=2)
                HL = jnp.cumsum(Hh, axis=2)
                G = GL[:, :, -1:]
                H = HL[:, :, -1:]
                GR = G - GL
                HR = H - HL
                gain = 0.5 * (
                    GL**2 / (HL + LAMBDA) + GR**2 / (HR + LAMBDA) - G**2 / (H + LAMBDA)
                )
                flat = gain.reshape(n_nodes, F * BINS)
                best = jnp.argmax(flat, axis=1)
                best_gain = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
                do_split = best_gain > 0.0
                bf = (best // BINS).astype(jnp.int32)
                bb = (best % BINS).astype(jnp.int32)
            else:
                # fixed fake split so histograms still feed the carry
                do_split = Gh[:, 0, 0] < 1e30
                bf = jnp.zeros((n_nodes,), jnp.int32)
                bb = jnp.full((n_nodes,), BINS // 2, jnp.int32)

            if use_scatter:
                base = jnp.arange(n_nodes, dtype=jnp.int32) + n_nodes - 1
                feat_t = feat_t.at[jnp.where(do_split, base, MAX_NODES - 1)].set(bf, mode="drop")
                thr_t = thr_t.at[jnp.where(do_split, base, MAX_NODES - 1)].set(bb, mode="drop")
                split_t = split_t.at[base].set(do_split)

            if use_route:
                nf = bf[node_of]
                nb = bb[node_of]
                row_bin = jnp.take_along_axis(bins_g, nf[:, None], axis=1)[:, 0]
                go_right = (row_bin > nb).astype(jnp.int32)
                splittable = do_split[node_of]
                node_of = jnp.where(splittable, 2 * node_of + go_right, 2 * node_of)
            else:
                node_of = 2 * node_of + (bins_g[:, 0] > BINS // 2).astype(jnp.int32) * 0

        leaf_onehot = jax.nn.one_hot(node_of, MAX_NODES, dtype=jnp.float32)
        Gl = leaf_onehot.T @ g
        Hl = leaf_onehot.T @ h
        wleaf = -Gl / (Hl + LAMBDA)
        margin = margin + 0.3 * wleaf[node_of]
        return margin, (feat_t[0] + thr_t[0], split_t[0])

    def run(margin0, keys):
        out, aux = jax.lax.scan(grow_tree, margin0, (jnp.arange(TREES), keys))
        return out, aux

    return jax.jit(jax.vmap(run, in_axes=(0, 0)))


rng = np.random.default_rng(0)
bins_np = rng.integers(0, BINS, size=(N, F)).astype(np.int32)
bins_g = jnp.asarray(bins_np)
onehot_g = jax.nn.one_hot(
    bins_g + jnp.arange(F)[None, :] * BINS, F * BINS, dtype=jnp.float32
).sum(axis=1)
onehot_g = jax.block_until_ready(onehot_g)
y_g = jnp.asarray((rng.standard_normal(N) > 0).astype(np.float32))

margins0 = jnp.zeros((S, N), jnp.float32)
all_keys = jax.vmap(lambda s: jax.random.split(jax.random.PRNGKey(s), TREES))(
    jnp.arange(S, dtype=jnp.uint32)
)

results = {}
for name in ["full", "no_rng", "no_scatter", "no_route", "hist_only", "no_gain"]:
    fn = make_variant(name)
    out, aux = fn(margins0, all_keys)
    np.asarray(out)  # sync (axon block_until_ready doesn't block)
    t0 = time.perf_counter()
    out, aux = fn(margins0, all_keys)
    np.asarray(out)
    dt = time.perf_counter() - t0
    ms_per_tree = dt / TREES * 1000
    results[name] = ms_per_tree
    print(f"{name:12s}  {dt:7.3f} s total   {ms_per_tree:7.2f} ms/tree")

print()
print(f"gain/cumsum/argmax cost : {results['hist_only'] - results['no_gain']:7.2f} ms/tree")
print(f"route cost              : {results['full'] - results['no_route']:7.2f} ms/tree")
print(f"scatter cost            : {results['full'] - results['no_scatter']:7.2f} ms/tree")
print(f"rng cost                : {results['full'] - results['no_rng']:7.2f} ms/tree")


def make_matmul_route():
    """Gather-free scan body: routing via one-hot contractions on the MXU,
    heap bookkeeping via static per-level concatenation (no scatters)."""

    bins_f = bins_g.astype(jnp.float32)

    def grow_tree(carry, inp):
        margin = carry
        tree_idx, key = inp
        k_row, _ = jax.random.split(key)
        sub = (jax.random.uniform(k_row, (N,)) < 0.9).astype(jnp.float32)
        p = jax.nn.sigmoid(margin)
        g = (p - y_g) * sub
        h = jnp.maximum(p * (1.0 - p), 1e-16) * sub

        node_of = jnp.zeros((N,), jnp.int32)
        feats, thrs, splits = [], [], []

        for depth in range(DEPTH):
            n_nodes = 2**depth
            node_onehot = jax.nn.one_hot(node_of, n_nodes, dtype=jnp.float32)
            A = jnp.concatenate(
                [node_onehot * g[:, None], node_onehot * h[:, None]], axis=1
            )  # (N, 2*n_nodes) -> ONE matmul for G and H
            GH = A.T @ onehot_g  # (2*n_nodes, F*BINS)
            Gh = GH[:n_nodes].reshape(n_nodes, F, BINS)
            Hh = GH[n_nodes:].reshape(n_nodes, F, BINS)

            GL = jnp.cumsum(Gh, axis=2)
            HL = jnp.cumsum(Hh, axis=2)
            G = GL[:, :, -1:]
            H = HL[:, :, -1:]
            GR = G - GL
            HR = H - HL
            gain = 0.5 * (
                GL**2 / (HL + LAMBDA) + GR**2 / (HR + LAMBDA) - G**2 / (H + LAMBDA)
            )
            flat = gain.reshape(n_nodes, F * BINS)
            best = jnp.argmax(flat, axis=1)
            best_gain = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
            do_split = best_gain > 0.0
            bf = (best // BINS).astype(jnp.int32)
            bb = (best % BINS).astype(jnp.int32)
            feats.append(bf)
            thrs.append(bb)
            splits.append(do_split)

            # gather-free routing: bins @ feat-onehot gives each row its
            # node's split-feature value; everything stays on MXU/VPU
            feat_oh = jax.nn.one_hot(bf, F, dtype=jnp.float32)  # (n_nodes, F)
            C = bins_f @ feat_oh.T  # (N, n_nodes): row's value of node's feature
            right = (C > bb[None, :].astype(jnp.float32)).astype(jnp.float32)
            go_right = jnp.sum(node_onehot * right, axis=1).astype(jnp.int32)
            splittable = (node_onehot @ do_split.astype(jnp.float32)) > 0.5
            node_of = jnp.where(splittable, 2 * node_of + go_right, 2 * node_of)

        leaf_onehot = jax.nn.one_hot(node_of, MAX_NODES, dtype=jnp.float32)
        Gl = leaf_onehot.T @ g
        Hl = leaf_onehot.T @ h
        wleaf = -Gl / (Hl + LAMBDA)
        margin = margin + 0.3 * (leaf_onehot @ wleaf)

        feat_t = jnp.concatenate(feats)
        thr_t = jnp.concatenate(thrs)
        split_t = jnp.concatenate(splits)
        return margin, (feat_t[0] + thr_t[0], split_t[0])

    def run(margin0, keys):
        return jax.lax.scan(grow_tree, margin0, (jnp.arange(TREES), keys))

    return jax.jit(jax.vmap(run, in_axes=(0, 0)))


fn = make_matmul_route()
out, aux = fn(margins0, all_keys)
np.asarray(out)
t0 = time.perf_counter()
out, aux = fn(margins0, all_keys)
np.asarray(out)
dt = time.perf_counter() - t0
print(f"matmul_route  {dt:7.3f} s total   {dt / TREES * 1000:7.2f} ms/tree")
