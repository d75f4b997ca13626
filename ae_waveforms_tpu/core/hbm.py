"""Analytic HBM working-set model for the vmapped multi-config trainers.

Why this exists: the widest profitable seed/config axis is bounded by HBM,
and the boundary is violent — on the real TPU the vmapped DL-classifier
program at the production shape (n=3200, batch 512, T=320, remat_chunk=20)
executes at S=18 and CRASHES the worker unrecoverably at S=22 (the
BENCH_r03 failure; bisection table in BENCHMARKS.md).  The shipped caps
were bisected constants (classify/dl.py round 4); this module derives them
from the program's tensor inventory instead, so NEW shapes (bigger batch,
longer sequences, larger hidden sizes) get a safe cap computed from their
own working set rather than rediscovering the cliff by crashing a worker.
The GBT side has had this pattern since round 3 (`hist_vmem_feasible`, a
calibrated VMEM envelope); this is its HBM counterpart.

Model. Per vmapped config, the dominant persistent+transient HBM of one
fused train block (every number f32):

  * layer output sequences — each scan layer's full (B, T, h) output is
    materialised as the next layer's input and kept for backward (chunked
    remat re-derives the INTERNAL carries, not the inter-layer streams),
    plus one extra largest-layer buffer for the gradient wavefront;
  * remat boundary carries — ceil(T/chunk) * B * h per layer (+ the live
    chunk window, chunk * B * h);
  * parameter-shaped state — params, Adam m/v, best-snapshot: 4 copies;
  * the config's resident data slice (train + val arrays).

The absolute scale of XLA's true peak (fragmentation, fusion transients,
double-buffering) is NOT predictable analytically, so the model carries
ONE calibration constant: the measured DL cliff pins the effective budget
(`_EFFECTIVE_BUDGET` = mid-bisection S=20 x the bench shape's per-seed
bytes), and caps are a SAFETY fraction of it — 0.4, the ratio of the
measured throughput optimum (S=8) to the cliff on the same shape, which
also matches where wide programs were measured to start thrashing.
The bisection itself is kept as the calibration test
(tests/test_dl_multi.py): if the model and the measurement ever disagree,
the test, not a crashed worker, says so.
"""

from __future__ import annotations

import math
from typing import Sequence

__all__ = [
    "train_block_hbm_bytes_per_config",
    "seed_axis_cap",
    "DL_BENCH_SHAPE",
]

_F32 = 4

# the shape the round-3/4 crash bisection ran at (classify/dl.py notes):
# n_train, n_val, T, batch, remat_chunk, hidden sizes of the stacked scans
DL_BENCH_SHAPE = dict(
    n_train=3200, n_val=800, seq_len=320, batch=512, remat_chunk=20,
    hidden_sizes=(128, 64, 64), param_count=156_000,
)

# measured: S=18 executes, S=22 crashes the worker -> budget pinned at the
# bisection midpoint S=20 (BENCHMARKS.md "DL classifier crash cliff")
_CLIFF_S = 20
# measured throughput optimum S=8 sits at 0.4x the cliff on the same shape
# (5.5/6.6/6.0 model-epochs/s at S=6/8/12, sharply worse at 16+)
_SAFETY = 0.4


def train_block_hbm_bytes_per_config(
    n_train: int,
    n_val: int,
    seq_len: int,
    batch: int,
    hidden_sizes: Sequence[int],
    param_count: int,
    remat_chunk: int = 0,
) -> int:
    """Analytic per-config HBM bytes of one fused train block (see module
    docstring for the inventory).  ``remat_chunk=0`` means no chunked
    rematerialisation: the full internal carry sequence is stored instead
    of boundary carries."""
    b = min(batch, max(n_train, 1))
    h_sum = sum(hidden_sizes)
    h_max = max(hidden_sizes)
    # inter-layer streams + one gradient-wavefront buffer
    streams = _F32 * b * seq_len * (h_sum + h_max)
    # internal carries: remat boundaries + live window, or the full series
    if remat_chunk and remat_chunk > 0:
        n_bound = math.ceil(seq_len / remat_chunk)
        carries = _F32 * b * sum(
            n_bound * h + remat_chunk * h for h in hidden_sizes
        )
    else:
        # un-remat scan: the backward pass stores ~4 gate activations per
        # step per layer on top of the carry series
        carries = _F32 * b * seq_len * 5 * h_sum
    state = 4 * _F32 * param_count  # params + Adam m/v + best snapshot
    data = _F32 * (n_train + n_val) * seq_len
    return streams + carries + state + data


def _bench_per_seed() -> int:
    s = DL_BENCH_SHAPE
    return train_block_hbm_bytes_per_config(
        s["n_train"], s["n_val"], s["seq_len"], s["batch"],
        s["hidden_sizes"], s["param_count"], s["remat_chunk"],
    )


def seed_axis_cap(
    n_train: int,
    n_val: int,
    seq_len: int,
    batch: int,
    hidden_sizes: Sequence[int],
    param_count: int,
    remat_chunk: int = 0,
    safety: float = _SAFETY,
    shared_bytes: int = 0,
) -> int:
    """Widest safe vmapped seed/config axis for a train-block program of
    this shape: ``safety`` x the calibrated effective budget, minus any
    config-SHARED resident bytes (e.g. the AE multi trainer replicates ONE
    dataset across all configs — pass its size here and zero for
    n_train/n_val), divided by the shape's own per-config working set.
    Reproduces the bisected ``DL_TPU_SEED_CHUNK = 8`` at the DL bench shape
    by construction, and shrinks when batch/sequence/hidden sizes grow.

    A second measured anchor validates the no-remat branch: the plain
    (unrematerialised) DL path was "HBM-bound at ~5" seeds
    (classify/dl.py) — this model gives exactly 5 at safety=1 for that
    shape."""
    budget = _CLIFF_S * _bench_per_seed()
    per = train_block_hbm_bytes_per_config(
        n_train, n_val, seq_len, batch, hidden_sizes, param_count, remat_chunk
    )
    return max(1, int((budget * safety - shared_bytes) // per))
