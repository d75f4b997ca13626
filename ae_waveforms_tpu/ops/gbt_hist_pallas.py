"""Fused per-level GBT histogram kernel (Pallas TPU).

The tree-growing scan in ``classify/gbt.py`` computes, at every level, the
gradient/hessian histograms of each LEFT child node:

    GH[s, c, f*B + b] = sum_i  [node_of[s, i] == 2*(c % half)]
                               * (g if c < half else h)[s, i]
                               * [bins[i, f] == b]

Under XLA this is a batched matmul ``A^T @ onehot`` whose LEFT operand is
the problem: the node-selected A (S, n, 2*half) — and the (S, n, nodes)
node one-hot producing it — is materialised in HBM every level, and
elimination benchmarking on chip (benchmarks/bench_gbt_v2.py, ROADMAP
"fake-histogram floor") showed this HBM-bound materialisation — not the MXU
work — is what holds the scan body at ~2 ms/tree.  XLA cannot fuse
producers into matmul operands, so the fix is Pallas-shaped: this kernel
streams one row-tile per grid step and builds A IN VMEM, so the only HBM
traffic per level is the raw inputs (g, h, node_of — ~3.6 MB) plus one
stream of the bin one-hot, carried as int8 (4x less traffic than XLA's f32
one-hot, 8 MB per level at 64 bins; measured: rebuilding the one-hot
in-kernel from the bins instead costs more VPU compare time than the int8
stream costs bandwidth, 6*trees rebuilds of a level-invariant matrix).

In-kernel construction avoids every Mosaic-fragile op: no lane-slicing, no
reshape, no transpose — every contraction is a plain (M, K) @ (K, N) dot.
The fit axis S is folded into the matmul ROWS via two tiny MXU expansions
with a precomputed 0/1 matrix E (C, 2S), C = S * 2 * half:

    X  = E  @ gh2_tile    # (C, 2S) @ (2S, tile): g/h values into their rows
    Nd = En @ node_tile   # (C, S) @ (S, tile):  node ids into every row
    A  = X * (Nd == k2)   # mask by "row sits in this left child"
    out += A @ onehot     # (C, tile) @ (tile, F*B); onehot streamed as int8

where ``k2`` (C, 1) holds each row's target node id (2*(c % half) after the
g/h split) and ``En = E[:, :S] + E[:, S:]``.  g/h/node stream through in
their natural (S, n) layout — no XLA-side transposes either.

Matmul operands for the histogram dot are cast to bf16 by default, matching
XLA's DEFAULT f32-matmul precision on the MXU (the existing path's
behaviour, see classify/gbt.py:155); ``precision="float32"`` keeps full f32
passes — interpret mode (the CPU oracle) uses it so tests compare f32
against f32.  Reference behaviour being replaced: the per-level histogram
matmul in classify/gbt.py:180-200 (itself the TPU redesign of the scatter
histograms inside the reference's consumed XGBoost C++ core,
/root/reference/main_ae_classify.py:67-75).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "left_histograms", "left_histograms_xla", "onehot_int8",
    "hist_vmem_feasible",
]

# Working-set ceiling for one kernel invocation.  Calibrated empirically on
# the v5e target with `_vmem_total` as the cost model: the shipped sweep
# shape (S=96, half=16, FB=640 -> 15.65 MB) compiles and wins its benchmark,
# while the next depth level (half=32 -> ~31 MB) is rejected by Mosaic.  The
# model is a proxy (it books the accumulator, the E/En/k2 routing constants
# and one single-buffered tile working set), so the limit is meaningful only
# together with it — both sides of the calibration used this exact formula.
VMEM_LIMIT = 16 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _vmem_total(S: int, C: int, FB: int, tile: int,
                precision: str = "bfloat16") -> int:
    """Modelled VMEM bytes: out accumulator (C, FB) f32 + routing constants
    E (C, 2S) / En (C, S) / k2 (C, 1) f32 + per-step buffers — X/Nd (C, tile)
    f32, A (C, tile) in the dot dtype (bf16 default, f32 when
    ``precision="float32"`` — a forced-f32 on-chip call books 2 more bytes
    per A element), the (tile, FB) int8 one-hot block double-buffered,
    gh2 (2S, tile) + node (S, tile) f32."""
    a_bytes = 2 if precision == "bfloat16" else 4
    return (4 * C * FB + 4 * C * (3 * S + 1)
            + tile * ((8 + a_bytes) * C + 2 * FB + 12 * S))


def _tile_for(S: int, C: int, FB: int, precision: str = "bfloat16") -> int:
    """Largest power-of-two row tile whose working set fits VMEM_LIMIT; 0 if
    even the minimum 128-row tile does not fit.  Tiles are powers of two so
    every candidate divides the fixed 512-multiple input padding."""
    for t in (512, 256, 128):
        if _vmem_total(S, C, FB, t, precision) <= VMEM_LIMIT:
            return t
    return 0


def hist_vmem_feasible(fit_axis: int, half: int, fb: int,
                       precision: str = "bfloat16") -> bool:
    """True if a level with ``half`` left children, vmapped over ``fit_axis``
    fits, can run the fused kernel.  Feasibility is monotone in ``half``, so
    callers gate a whole tree program on its deepest level (classify/gbt.py's
    auto backend policy).

    The VMEM_LIMIT/_vmem_total pair is calibrated on the v5e target only
    (the one generation measured: S=96/half=16 compiles, half=32 rejected);
    other TPU generations have different VMEM envelopes, so a forced-pallas
    call on them may be rejected by Mosaic despite this gate passing — the
    auto policy treats the gate as necessary, not sufficient, and every
    rejection surfaces as an actionable compile-time error."""
    return _tile_for(int(fit_axis), int(fit_axis) * 2 * int(half), int(fb),
                     precision) > 0


def _expansion_matrices(S: int, half: int):
    """E (C, 2S) routes gh2 rows into A rows; En (C, S) routes node ids;
    k2 (C, 1) is each A-row's left-child node id."""
    C = S * 2 * half
    E = np.zeros((C, 2 * S), np.float32)
    k2 = np.zeros((C, 1), np.float32)
    for s in range(S):
        for j in range(half):
            E[s * 2 * half + j, s] = 1.0  # g row
            E[s * 2 * half + half + j, S + s] = 1.0  # h row
            k2[s * 2 * half + j, 0] = 2 * j
            k2[s * 2 * half + half + j, 0] = 2 * j
    return E, E[:, :S] + E[:, S:], k2


def _hist_kernel(oh_ref, gh2_ref, node_ref, E_ref, En_ref, k2_ref, out_ref,
                 *, dot_dtype):
    """One row-tile: build the A operand in VMEM, accumulate out."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # A (C, tile): g/h values routed into their (fit, child) rows and masked
    # by left-child membership — two thin-K MXU dots plus full-block VPU ops
    X = jnp.dot(E_ref[:], gh2_ref[:], preferred_element_type=jnp.float32)
    Nd = jnp.dot(En_ref[:], node_ref[:], preferred_element_type=jnp.float32)
    A = (X * (Nd == k2_ref[:]).astype(jnp.float32)).astype(dot_dtype)

    out_ref[:] += jnp.dot(
        A, oh_ref[:].astype(dot_dtype), preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit,
    static_argnames=("half", "n_bins", "interpret", "precision"),
)
def _left_hist_batched(onehot_i8, g, h, node_of, *, half, n_bins,
                       interpret=False, precision="bfloat16"):
    """(S, n) g/h/node + shared (n, F*n_bins) int8 bin one-hot ->
    (S, 2*half, F*n_bins)."""
    S, n = g.shape
    FB = onehot_i8.shape[1]
    C = S * 2 * half
    tile = _tile_for(S, C, FB, precision)
    if tile == 0:
        if interpret:
            tile = 128  # the CPU oracle has no VMEM; any tile is fine
        else:
            raise ValueError(
                f"gbt_hist_pallas: working set for S={S}, half={half}, "
                f"FB={FB} (accumulator {4 * C * FB >> 20} MiB) exceeds the "
                f"{VMEM_LIMIT >> 20} MiB VMEM model at every tile size — "
                "this shape cannot compile on the target (measured on v5e); "
                "use hist_impl='xla' for deep trees / wide fit chunks "
                "(classify/gbt.py's auto policy does this selection)"
            )
    # inputs pad to a FIXED 512 multiple (every tile divides it): the padded
    # one-hot is then identical at every tree level, so XLA CSEs/hoists ONE
    # copy out of the scan body instead of re-padding ~8 MB per level
    n_pad = _cdiv(n, 512) * 512
    if n_pad != n:
        pad = n_pad - n
        # padded rows carry g = h = 0 (and an all-zero one-hot row) -> zero
        # contribution whatever their node values
        onehot_i8 = jnp.pad(onehot_i8, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad)))
        h = jnp.pad(h, ((0, 0), (0, pad)))
        node_of = jnp.pad(node_of, ((0, 0), (0, pad)))

    E_np, En_np, k2_np = _expansion_matrices(S, half)
    gh2 = jnp.concatenate([g, h], axis=0)  # (2S, n_pad)
    node_f = node_of.astype(jnp.float32)  # (S, n_pad); ids < 2^depth exact

    out = pl.pallas_call(
        functools.partial(
            _hist_kernel, dot_dtype=(
                jnp.bfloat16 if precision == "bfloat16" else jnp.float32
            ),
        ),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, FB), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * S, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * S), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, FB), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, FB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(onehot_i8, gh2, node_f, jnp.asarray(E_np), jnp.asarray(En_np), jnp.asarray(k2_np))
    return out.reshape(S, 2 * half, FB)


def left_histograms_xla(bins, g, h, node_of, *, half, n_bins):
    """Batched XLA reference of the same contraction (oracle for tests;
    mirrors the in-line histogram code of classify/gbt.py:180-200)."""
    F = bins.shape[1]
    onehot = (bins[:, :, None] == jnp.arange(n_bins)[None, None, :]).astype(
        jnp.float32
    ).reshape(bins.shape[0], F * n_bins)
    sel = (node_of[:, :, None] == 2 * jnp.arange(half)[None, None, :]).astype(
        jnp.float32
    )  # (S, n, half)
    A = jnp.concatenate(
        [sel * g[:, :, None], sel * h[:, :, None]], axis=2
    )  # (S, n, 2*half)
    return jnp.einsum("snc,nb->scb", A, onehot)


@functools.lru_cache(maxsize=None)
def _make_left_histograms(half: int, n_bins: int, interpret: bool, precision: str):
    """custom_vmap wrapper: the un-vmapped call runs S=1; one level of vmap
    (the sweep/multi-seed fit axis) folds into the kernel's row axis instead
    of a per-fit grid dimension (which would rebuild the bin one-hot S times
    per tile)."""

    @jax.custom_batching.custom_vmap
    def left_hist(onehot_i8, g, h, node_of):
        return _left_hist_batched(
            onehot_i8, g[None], h[None], node_of[None],
            half=half, n_bins=n_bins, interpret=interpret, precision=precision,
        )[0]

    @left_hist.def_vmap
    def _rule(axis_size, in_batched, onehot_i8, g, h, node_of):
        oh_b, g_b, h_b, node_b = in_batched
        if oh_b:
            raise NotImplementedError(
                "left_histograms expects the binned pool shared across the "
                "vmapped fit axis"
            )
        bcast = lambda x, b: x if b else jnp.broadcast_to(  # noqa: E731
            x[None], (axis_size,) + x.shape
        )
        out = _left_hist_batched(
            onehot_i8, bcast(g, g_b), bcast(h, h_b), bcast(node_of, node_b),
            half=half, n_bins=n_bins, interpret=interpret, precision=precision,
        )
        return out, True

    return left_hist


def onehot_int8(bins, n_bins):
    """(n, F) int32 bins -> (n, F*n_bins) int8 one-hot, built ONCE per fit
    program and streamed through the kernel each level (4x less HBM traffic
    than XLA's f32 one-hot; rebuilding it in-kernel was measured slower)."""
    n, F = bins.shape
    return (bins[:, :, None] == jnp.arange(n_bins)[None, None, :]).astype(
        jnp.int8
    ).reshape(n, F * n_bins)


def left_histograms(onehot_i8, g, h, node_of, *, half, n_bins,
                    interpret=False, precision=None):
    """Per-level left-child G/H histograms, (2*half, F*n_bins).

    vmap over (g, h, node_of) — the sweep's fit axis — batches into one
    kernel whose matmul rows carry every fit.  ``onehot_i8`` (from
    :func:`onehot_int8`) must stay unbatched (the shared pre-binned pool).
    Default precision is bf16 operands with f32 accumulation (XLA's own
    DEFAULT f32-matmul behaviour on the MXU); interpret mode — the CPU
    oracle — defaults to full float32 so tests compare f32 against the f32
    XLA reference."""
    if precision is None:
        precision = "float32" if interpret else "bfloat16"
    fn = _make_left_histograms(int(half), int(n_bins), bool(interpret), precision)
    return fn(onehot_i8, g, h, node_of)
