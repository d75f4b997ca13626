"""Fused per-level GBT row-routing kernel (Pallas TPU).

Stage elimination at the shipped sweep shape (S=96 fit chunks, n=12500,
F=10, 64 bins, depth 6 — benchmarks/bench_gbt_elim4.py, BENCHMARKS.md
round 5) pinned the tree scan's largest residual on ROUTING, not on the
gain/argmax epilogue the round-4 fusion idea targeted: 40.1% of the body
vs the epilogue's 0.4%.  Under XLA the per-level routing

    C        = bins_f @ feat_oh.T                    # (n, n_nodes)
    right    = C > bb + 0.5
    go_right = sum(node_onehot * right, axis=1)
    node_of  = where(node_onehot @ do_split, 2*node_of + go_right,
                     2*node_of)

materialises several (S, n, n_nodes) float32 intermediates in HBM every
level (~1.4 GB per tree summed over levels at the shipped shape) because
XLA cannot keep the compare/select chain in registers across the matmuls.
The per-row-gather alternative was measured 48x SLOWER (elim4's
``route_gather`` variant): row-indexed gathers are hostile to the TPU's
vector memory, so the matmul formulation is right — it just needs its
intermediates kept in VMEM.

This kernel computes one row-tile per grid step with every intermediate
VMEM-resident.  As in ops/gbt_hist_pallas.py, the vmapped fit axis S folds
into matmul ROWS (R = S * n_nodes) via precomputed 0/1 expansion matrices,
and every contraction is a plain (M, K) @ (K, N) dot — no reshapes, no
transposes, no lane slicing:

    D    = featoh @ binsT_tile       # (R, F) @ (F, tile): each node's
                                     #   split-feature bin value, per row
    Nd   = En @ node_tile            # (R, S) @ (S, tile): row node ids
                                     #   broadcast into every (fit, node) row
    m    = (Nd == k) & (D > bb + .5) # row i sits in node j AND goes right
    go   = Er @ (m * do)             # (S, R) @ (R, tile): fold node rows
                                     #   back per fit; <=1 nonzero per column
    out  = 2 * node_tile + go

Exactness: every dot is 0/1-or-small-integer operands (bin ids < n_bins
<= 256 and node ids < n_nodes are exact in bf16; accumulation is f32, and
each output column sums at most one nonzero term), so the routing decision
is BIT-IDENTICAL to the XLA formulation — verified by the margin-equality
tests.  HBM traffic per level drops to the raw inputs (binsT streamed once
per level thanks to the revisit-free block index, node ids in and out).

Reference behaviour being replaced: the routing chain of
classify/gbt.py's tree scan (itself the TPU redesign of row partitioning
inside the reference's consumed XGBoost C++ core,
/root/reference/main_ae_classify.py:67-75).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["route_rows", "route_rows_xla", "route_vmem_feasible"]

# Same empirical working-set ceiling as the histogram kernel (calibrated on
# the v5e target; see ops/gbt_hist_pallas.py:VMEM_LIMIT).  Meaningful only
# together with _vmem_total below.
VMEM_LIMIT = 16 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _vmem_total(S: int, R: int, F: int, tile: int) -> int:
    """Modelled VMEM bytes for one grid step: the (R, tile) intermediates
    D / Nd / mask (f32, f32, bf16-cast), the f32 constants featoh (R, F) /
    bb, do, k (R, 1) / En (R, S) / Er (S, R), and the double-buffered
    streams binsT (F, tile) + node in / out (S, tile)."""
    return (tile * R * (4 + 4 + 2)
            + 4 * R * (F + 3) + 8 * R * S
            + 2 * 4 * tile * (F + 2 * S))


def _tile_for(S: int, R: int, F: int) -> int:
    """Largest power-of-two row tile whose working set fits VMEM_LIMIT; 0 if
    even 128 rows do not fit (callers fall back to the XLA formulation).
    Powers of two so every candidate divides the fixed 512-multiple pad."""
    for t in (512, 256, 128):
        if _vmem_total(S, R, F, t) <= VMEM_LIMIT:
            return t
    return 0


def route_vmem_feasible(fit_axis: int, n_nodes: int, n_features: int) -> bool:
    """True if a level with ``n_nodes`` nodes, vmapped over ``fit_axis``
    fits, can run the fused routing kernel.  Monotone in ``n_nodes``.
    Levels wider than 256 nodes are always infeasible (node ids must stay
    bf16-exact through the kernel's matmul operands)."""
    return int(n_nodes) <= 256 and _tile_for(
        int(fit_axis), int(fit_axis) * int(n_nodes), int(n_features)) > 0


def _route_matrices(S: int, n_nodes: int):
    """En (R, S) routes each fit's node-id row into its n_nodes block rows;
    Er (S, R) folds block rows back per fit; k (R, 1) is each row's target
    node id."""
    R = S * n_nodes
    En = np.zeros((R, S), np.float32)
    Er = np.zeros((S, R), np.float32)
    k = np.zeros((R, 1), np.float32)
    for s in range(S):
        for j in range(n_nodes):
            En[s * n_nodes + j, s] = 1.0
            Er[s, s * n_nodes + j] = 1.0
            k[s * n_nodes + j, 0] = j
    return En, Er, k


def _route_kernel(binsT_ref, node_ref, featoh_ref, bb_ref, do_ref,
                  En_ref, Er_ref, k_ref, out_ref):
    """One row-tile: all routing intermediates stay in VMEM."""
    dt = jnp.bfloat16
    D = jnp.dot(featoh_ref[:].astype(dt), binsT_ref[:].astype(dt),
                preferred_element_type=jnp.float32)  # (R, tile)
    Nd = jnp.dot(En_ref[:].astype(dt), node_ref[:].astype(dt),
                 preferred_element_type=jnp.float32)  # (R, tile)
    mask = ((Nd == k_ref[:]) & (D > bb_ref[:] + 0.5)).astype(jnp.float32)
    go = jnp.dot(Er_ref[:].astype(dt), (mask * do_ref[:]).astype(dt),
                 preferred_element_type=jnp.float32)  # (S, tile)
    out_ref[:] = 2.0 * node_ref[:] + go


@functools.partial(jax.jit, static_argnames=("n_nodes", "interpret"))
def _route_batched(binsT, node_of, bf, bb, do_split, *, n_nodes,
                   interpret=False):
    """(F, n) shared transposed bins + (S, n) node ids + (S, n_nodes) per-fit
    splits -> (S, n) routed node ids (int32).

    Falls back to the XLA formulation at trace time when the modelled
    working set exceeds VMEM at every tile size (static-shape decision, so
    no runtime cost and no extra policy plumbing in the caller)."""
    F, n = binsT.shape
    S = node_of.shape[0]
    R = S * n_nodes
    tile = _tile_for(S, R, F)
    # the kernel carries node ids through bf16 matmul operands, exact only
    # up to 256 — wider levels use the XLA chain (their working set would
    # not fit VMEM at any realistic fit axis anyway)
    if n_nodes > 256 or (tile == 0 and not interpret):
        return _route_xla_batched(binsT, node_of, bf, bb, do_split, n_nodes)
    if tile == 0:
        tile = 128  # the CPU oracle has no VMEM; any tile is fine

    # fixed 512-multiple pad (every tile divides it): the padded binsT is
    # level-invariant, so XLA hoists ONE copy out of the tree scan
    n_pad = _cdiv(n, 512) * 512
    if n_pad != n:
        pad = n_pad - n
        binsT = jnp.pad(binsT, ((0, 0), (0, pad)))
        node_of = jnp.pad(node_of, ((0, 0), (0, pad)))

    En_np, Er_np, k_np = _route_matrices(S, n_nodes)
    node_f = node_of.astype(jnp.float32)  # ids < n_nodes <= 256: exact
    featoh = jax.nn.one_hot(bf.reshape(R), F, dtype=jnp.float32)  # (R, F)
    bb_col = bb.astype(jnp.float32).reshape(R, 1)
    do_col = do_split.astype(jnp.float32).reshape(R, 1)

    out = pl.pallas_call(
        _route_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((F, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(binsT, node_f, featoh, bb_col, do_col,
      jnp.asarray(En_np), jnp.asarray(Er_np), jnp.asarray(k_np))
    return out[:, :n].astype(jnp.int32)


def _route_xla_batched(binsT, node_of, bf, bb, do_split, n_nodes):
    """Batched XLA reference of the same routing decision (oracle for tests
    and the in-jit fallback; mirrors classify/gbt.py's routing chain)."""
    bins_f = binsT.T  # (n, F)
    node_onehot = jax.nn.one_hot(node_of, n_nodes, dtype=jnp.float32)
    feat_oh = jax.nn.one_hot(bf, bins_f.shape[1], dtype=jnp.float32)
    C = jnp.einsum("nf,sjf->snj", bins_f, feat_oh)
    right = (C > bb[:, None, :].astype(jnp.float32) + 0.5).astype(jnp.float32)
    go_right = (jnp.sum(node_onehot * right, axis=2) > 0.5).astype(jnp.int32)
    splittable = jnp.einsum(
        "snj,sj->sn", node_onehot, do_split.astype(jnp.float32)) > 0.5
    return jnp.where(splittable, 2 * node_of + go_right, 2 * node_of)


@functools.lru_cache(maxsize=None)
def _make_route_rows(n_nodes: int, interpret: bool):
    """custom_vmap wrapper: un-vmapped runs S=1; one level of vmap (the
    sweep/multi-seed fit axis) folds into the kernel's row axis."""

    @jax.custom_batching.custom_vmap
    def route(binsT, node_of, bf, bb, do_split):
        return _route_batched(
            binsT, node_of[None], bf[None], bb[None], do_split[None],
            n_nodes=n_nodes, interpret=interpret,
        )[0]

    @route.def_vmap
    def _rule(axis_size, in_batched, binsT, node_of, bf, bb, do_split):
        binsT_b, node_b, bf_b, bb_b, do_b = in_batched
        if binsT_b:
            raise NotImplementedError(
                "route_rows expects the binned pool shared across the "
                "vmapped fit axis"
            )
        bcast = lambda x, b: x if b else jnp.broadcast_to(  # noqa: E731
            x[None], (axis_size,) + x.shape
        )
        out = _route_batched(
            binsT, bcast(node_of, node_b), bcast(bf, bf_b), bcast(bb, bb_b),
            bcast(do_split, do_b), n_nodes=n_nodes, interpret=interpret,
        )
        return out, True

    return route


def route_rows(binsT, node_of, bf, bb, do_split, *, n_nodes,
               interpret=False):
    """Route every pool row one tree level down, (n,) int32 -> (n,) int32.

    ``binsT`` is the (F, n) transposed pre-binned pool, shared across the
    vmapped fit axis (vmap over the other four arguments batches into one
    kernel, like ops/gbt_hist_pallas.left_histograms).  ``bf``/``bb``/
    ``do_split`` are the level's per-node split feature / bin / validity.
    Decisions are bit-identical to the XLA routing chain (see module
    docstring); shapes whose working set exceeds the VMEM model fall back
    to that chain at trace time."""
    fn = _make_route_rows(int(n_nodes), bool(interpret))
    return fn(binsT, node_of, bf, bb, do_split)
