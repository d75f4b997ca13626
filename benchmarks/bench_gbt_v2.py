"""Second-stage GBT scan-body optimization benchmark.

Starts from the gather-free `matmul_route` body (72 -> 13.8 ms/tree) and
measures three further structural optimizations:
  sibling    — compute histograms only for left children; right = parent - left
               (halves MXU histogram FLOPs)
  trimm      — cumsum over bins as a lower-triangular matmul on the MXU
               (XLA lowers cumsum as O(W*N) reduce_window on the VPU)
  fake_hist  — replace the histogram matmul with a cheap stand-in to isolate
               the aux (gain/route/bookkeeping) cost
"""
from __future__ import annotations

import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

S, N, F, BINS, DEPTH, TREES = 24, 12500, 10, 256, 6, 20
MAX_NODES = 2**DEPTH
LAMBDA = 1.0

rng = np.random.default_rng(0)
bins_np = rng.integers(0, BINS, size=(N, F)).astype(np.int32)
bins_g = jnp.asarray(bins_np)
onehot_g = jax.nn.one_hot(
    bins_g + jnp.arange(F)[None, :] * BINS, F * BINS, dtype=jnp.float32
).sum(axis=1)
onehot_g = jax.block_until_ready(onehot_g)
y_g = jnp.asarray((rng.standard_normal(N) > 0).astype(np.float32))
bins_f = bins_g.astype(jnp.float32)
TRI = jnp.tril(jnp.ones((BINS, BINS), jnp.float32)).T  # (b, b'): 1 if b' <= b -> cumsum via x @ TRI? see below


def make(sibling=False, trimm=False, fake_hist=False):
    def cumsum_bins(x):
        # x: (..., BINS) cumulative along last axis
        if trimm:
            return x @ TRI  # (..., BINS) @ (BINS, BINS); TRI[i,j] = 1 if i <= j
        return jnp.cumsum(x, axis=-1)

    def grow_tree(carry, inp):
        margin = carry
        tree_idx, key = inp
        k_row, _ = jax.random.split(key)
        sub = (jax.random.uniform(k_row, (N,)) < 0.9).astype(jnp.float32)
        p = jax.nn.sigmoid(margin)
        g = (p - y_g) * sub
        h = jnp.maximum(p * (1.0 - p), 1e-16) * sub

        node_of = jnp.zeros((N,), jnp.int32)
        is_left = jnp.ones((N,), jnp.float32)  # row went left at last split
        feats, thrs, splits = [], [], []
        parentG = None  # (n_nodes_prev, F, BINS)
        parentH = None

        for depth in range(DEPTH):
            n_nodes = 2**depth
            node_onehot = jax.nn.one_hot(node_of, n_nodes, dtype=jnp.float32)
            if fake_hist:
                s = g.sum() * 1e-20
                Gh = s + jnp.ones((n_nodes, F, BINS), jnp.float32) * jnp.arange(BINS)
                Hh = s + jnp.ones((n_nodes, F, BINS), jnp.float32)
            elif sibling and depth > 0:
                half = n_nodes // 2
                # left children have even node ids: columns 0,2,4,... of node_onehot
                left_sel = node_onehot[:, 0::2]  # (N, half)
                A = jnp.concatenate([left_sel * g[:, None], left_sel * h[:, None]], axis=1)
                GH = A.T @ onehot_g  # (2*half, F*BINS)
                Gl = GH[:half].reshape(half, F, BINS)
                Hl = GH[half:].reshape(half, F, BINS)
                Gr = parentG - Gl
                Hr = parentH - Hl
                Gh = jnp.stack([Gl, Gr], axis=1).reshape(n_nodes, F, BINS)
                Hh = jnp.stack([Hl, Hr], axis=1).reshape(n_nodes, F, BINS)
            else:
                A = jnp.concatenate([node_onehot * g[:, None], node_onehot * h[:, None]], axis=1)
                GH = A.T @ onehot_g
                Gh = GH[:n_nodes].reshape(n_nodes, F, BINS)
                Hh = GH[n_nodes:].reshape(n_nodes, F, BINS)
            parentG, parentH = Gh, Hh

            GL = cumsum_bins(Gh)
            HL = cumsum_bins(Hh)
            G = GL[:, :, -1:]
            H = HL[:, :, -1:]
            GR = G - GL
            HR = H - HL
            gain = 0.5 * (GL**2 / (HL + LAMBDA) + GR**2 / (HR + LAMBDA) - G**2 / (H + LAMBDA))
            flat = gain.reshape(n_nodes, F * BINS)
            best = jnp.argmax(flat, axis=1)
            best_gain = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
            do_split = best_gain > 0.0
            bf = (best // BINS).astype(jnp.int32)
            bb = (best % BINS).astype(jnp.int32)
            feats.append(bf); thrs.append(bb); splits.append(do_split)

            feat_oh = jax.nn.one_hot(bf, F, dtype=jnp.float32)
            C = bins_f @ feat_oh.T
            right = (C > bb[None, :].astype(jnp.float32)).astype(jnp.float32)
            go_right = jnp.sum(node_onehot * right, axis=1).astype(jnp.int32)
            splittable = (node_onehot @ do_split.astype(jnp.float32)) > 0.5
            node_of = jnp.where(splittable, 2 * node_of + go_right, 2 * node_of)
            # when sibling-subtracting, parent of a non-split node has both
            # children empty-left semantics; fine: left child == parent rows
            if sibling:
                # expand parent hists to the next level's parent array only
                # when needed (they are indexed by next level's parent = node)
                pass

        leaf_onehot = jax.nn.one_hot(node_of, MAX_NODES, dtype=jnp.float32)
        Gl_ = leaf_onehot.T @ g
        Hl_ = leaf_onehot.T @ h
        wleaf = -Gl_ / (Hl_ + LAMBDA)
        margin = margin + 0.3 * (leaf_onehot @ wleaf)
        return margin, (jnp.concatenate(feats)[0], jnp.concatenate(splits)[0])

    def run(margin0, keys):
        return jax.lax.scan(grow_tree, margin0, (jnp.arange(TREES), keys))

    return jax.jit(jax.vmap(run, in_axes=(0, 0)))


margins0 = jnp.zeros((S, N), jnp.float32)
all_keys = jax.vmap(lambda s: jax.random.split(jax.random.PRNGKey(s), TREES))(
    jnp.arange(S, dtype=jnp.uint32))

configs = [
    dict(),
    dict(sibling=True),
    dict(trimm=True),
    dict(sibling=True, trimm=True),
    dict(fake_hist=True),
    dict(fake_hist=True, trimm=True),
]
outs = {}
for cfg in configs:
    name = ",".join(k for k, v in cfg.items() if v) or "base"
    fn = make(**cfg)
    out, aux = fn(margins0, all_keys)
    np.asarray(out)
    t0 = time.perf_counter()
    out, aux = fn(margins0, all_keys)
    np.asarray(out)
    dt = time.perf_counter() - t0
    outs[name] = np.asarray(out)
    print(f"{name:22s}  {dt:7.3f} s   {dt/TREES*1000:7.2f} ms/tree")

# correctness: sibling subtraction must not change the fitted margins
if not np.allclose(outs["base"], outs["sibling"], atol=1e-4):
    print("WARNING: sibling margins differ, max abs diff",
          np.abs(outs["base"] - outs["sibling"]).max())
else:
    print("sibling == base  (max diff", np.abs(outs["base"] - outs["sibling"]).max(), ")")
if not np.allclose(outs["base"], outs["trimm"], atol=1e-4):
    print("WARNING: trimm margins differ, max abs diff",
          np.abs(outs["base"] - outs["trimm"]).max())
else:
    print("trimm == base    (max diff", np.abs(outs["base"] - outs["trimm"]).max(), ")")
