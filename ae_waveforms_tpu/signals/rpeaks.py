"""R-peak detection — fixed-shape JAX kernel, vmappable over samples.

Replicates the behaviour of the gradient-threshold QRS detector that the
reference invokes through ``nk.ecg_findpeaks(x, sampling_rate)`` with its
default "neurokit" method (reference: remove_samples.py:50-51).  Algorithm
(Brammer 2020 biopeaks detector, as published):

1. absolute gradient of the signal, boxcar-smoothed twice
   (0.1 s smoothing window, 0.75 s averaging window);
2. QRS candidate regions where the smoothed gradient exceeds
   1.5x its local average;
3. within each region, the local maximum with the largest topographic
   prominence (scipy ``find_peaks(prominence=(None, None))`` semantics,
   bases confined to the region);
4. regions shorter than 0.4x the mean region length are dropped, and peaks
   closer than 0.3 s to the previously accepted peak are dropped (including
   an initial virtual peak at index 0 — so peaks in the first 0.3 s are
   never reported, a quirk preserved for parity).

TPU-native design: everything is fixed shape.  Candidate local maxima are
evaluated for *every* position; nearest-higher-neighbour searches use
sparse-table (doubling) range-max queries, giving an O(T log T) fully
vectorised prominence computation instead of scipy's sequential stack walk.
The only sequential part is the final min-delay acceptance, a
``lax.scan`` over at most ``max_segments`` regions.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["find_rpeaks", "find_rpeaks_batch", "MAX_SEGMENTS", "MAX_PEAKS"]

MAX_SEGMENTS = 128  # QRS candidate regions per 20-s window (>= physiological max)
# legacy fixed output width; the kernels now derive the peak-buffer width
# from the window length and refractory period (see find_rpeaks)
MAX_PEAKS = 72


def _gradient(x: jnp.ndarray) -> jnp.ndarray:
    """np.gradient: central differences, one-sided at the edges."""
    interior = (x[2:] - x[:-2]) * 0.5
    first = x[1] - x[0]
    last = x[-1] - x[-2]
    return jnp.concatenate([first[None], interior, last[None]])


def _boxcar_smooth(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Edge-replicating boxcar smoothing matching the reference detector's
    helper: pad `size` copies of each edge value, convolve 'same' with a
    normalized boxcar, trim the padding.

    The shifted cumulative sums are STATIC slices (offsets are compile-time
    constants), not clipped-iota gathers — a (256, 10k) batch pays ~36 ms
    per gather on TPU and 0 for a slice (benchmarks/abl_scatter.py)."""
    padded = jnp.concatenate([jnp.full((size,), x[0], x.dtype), x, jnp.full((size,), x[-1], x.dtype)])
    # np.convolve(w, padded, 'same') with boxcar w of length `size` equals a
    # moving mean over window [n - size + 1 + (size-1)//2, n + (size-1)//2].
    csum = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(padded)])
    P = padded.shape[0]
    lo_off = (size - 1) // 2 - size + 1  # <= 0
    hi_off = (size - 1) // 2
    # csum[clip(n + lo_off, 0, P)] for n in [0, P) as a static slice+edge pad
    lo_vals = jnp.concatenate([jnp.full((-lo_off,), csum[0], x.dtype), csum[: P + lo_off]])
    # csum[clip(n + hi_off + 1, 0, P)] likewise
    hi_vals = jnp.concatenate([csum[hi_off + 1 :], jnp.full((hi_off,), csum[P], x.dtype)])
    same = (hi_vals - lo_vals) / size
    return same[size:-size]


def _sparse_tables(x: jnp.ndarray, levels: int):
    """Doubling tables: maxt[k][i] = max x[i : i+2^k], mint likewise."""
    maxt = [x]
    mint = [x]
    for k in range(1, levels):
        half = 1 << (k - 1)
        prev_max, prev_min = maxt[-1], mint[-1]
        shifted_max = jnp.concatenate([prev_max[half:], prev_max[-half:]])
        shifted_min = jnp.concatenate([prev_min[half:], prev_min[-half:]])
        maxt.append(jnp.maximum(prev_max, shifted_max))
        mint.append(jnp.minimum(prev_min, shifted_min))
    return jnp.stack(maxt), jnp.stack(mint)


def _range_query(table: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray, reduce_max: bool):
    """Query max/min over x[lo..hi] inclusive (lo <= hi) via two overlapping
    power-of-two blocks.  Vectorized over query arrays."""
    length = hi - lo + 1
    k = jnp.where(length > 0, jnp.floor(jnp.log2(jnp.maximum(length, 1).astype(jnp.float32))).astype(jnp.int32), 0)
    block = (1 << k).astype(jnp.int32)
    a = table[k, lo]
    b = table[k, hi - block + 1]
    return jnp.maximum(a, b) if reduce_max else jnp.minimum(a, b)


def _nearest_higher(maxt, pos, v, lo_bound, hi_bound, levels, left: bool):
    """For each position `pos` with value `v`, the nearest index j in
    [lo_bound, pos-1] (left) or [pos+1, hi_bound] (right) with x[j] > v;
    returns the *boundary of the walked region*: the walk stops at j (which
    is the first strictly-higher point) or at the border.

    Each descent step queries a block of length exactly 2^k, which is ONE
    entry of sparse-table row k — a 1D gather from a static row, not the 2D
    (level, position) gather of the general ``_range_query``."""
    T = maxt.shape[1]
    if left:
        idx = pos  # exclusive upper end of the unexplored region
        for k in range(levels - 1, -1, -1):
            step = 1 << k
            cand = idx - step
            ok = cand >= lo_bound
            # max over [cand, idx-1] (length step) == maxt[k][cand]
            blk_max = maxt[k][jnp.clip(cand, 0, T - 1)]
            jumpable = ok & (blk_max <= v)
            idx = jnp.where(jumpable, cand, idx)
        # x[idx-1] > v when idx > lo_bound, else border.
        stop = idx - 1
        return jnp.maximum(stop, lo_bound - 1)
    else:
        idx = pos  # exclusive lower end (idx = last explored)
        for k in range(levels - 1, -1, -1):
            step = 1 << k
            cand = idx + step
            ok = cand <= hi_bound
            # max over [idx+1, cand] (length step) == maxt[k][idx+1]
            blk_max = maxt[k][jnp.clip(idx + 1, 0, T - 1)]
            jumpable = ok & (blk_max <= v)
            idx = jnp.where(jumpable, cand, idx)
        stop = idx + 1
        return jnp.minimum(stop, hi_bound + 1)


#: light-path candidate buffer (see ``find_rpeaks_batch``): band-limited ECG
#: has at most ~600 strict local maxima per 20-s window (30 Hz LP bound), so
#: 1024 slots cover every real workload; inputs with more local maxima (e.g.
#: the public cfg.butter_lp_ecg=0 knob) take the provable-bound path instead.
LIGHT_CANDIDATES = 1024


@functools.partial(jax.jit, static_argnames=("sampling_rate", "max_peaks", "candidate_slots"))
def find_rpeaks(
    signal: jnp.ndarray,
    sampling_rate: int = 500,
    max_peaks: Optional[int] = None,
    candidate_slots: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Detect R peaks in one window.

    Returns (peaks, n_peaks): ``peaks`` is (max_peaks,) int32 padded with -1.
    ``max_peaks`` defaults to the provable bound for the window: the 0.3 s
    min-delay refractory admits at most T/mindelay peaks (and the acceptance
    scan sees at most MAX_SEGMENTS segments), so no acceptable peak can ever
    be silently truncated whatever ``sample_length`` is configured.

    ``candidate_slots`` narrows the prominence-walk buffer; callers MUST
    guarantee the window has at most that many strict interior local maxima
    (``find_rpeaks_batch`` checks at runtime and falls back to the provable
    bound).  The walk cost is linear in the slot count, so the narrow buffer
    is the difference between walking 1024 vs 5000 slots per window.
    """
    x = signal.astype(jnp.float32)
    T = x.shape[0]
    levels = int(np.ceil(np.log2(T))) + 1

    smoothwindow, avgwindow = 0.1, 0.75
    gradthreshweight, minlenweight, mindelay_s = 1.5, 0.4, 0.3
    smooth_kernel = int(np.rint(smoothwindow * sampling_rate))
    avg_kernel = int(np.rint(avgwindow * sampling_rate))
    mindelay = int(np.rint(mindelay_s * sampling_rate))
    if max_peaks is None:
        max_peaks = min(MAX_SEGMENTS, T // mindelay + 2)
    # strict local maxima cannot be adjacent, so (T-1)//2 + 1 bounds the
    # in-segment candidate count for ANY input — no silent drop cliff even
    # for unfiltered broadband signals (cfg.butter_lp_ecg=0 is a public knob)
    max_candidates = (T - 1) // 2 + 1
    if candidate_slots is not None:
        max_candidates = min(max_candidates, candidate_slots)

    absgrad = jnp.abs(_gradient(x))
    smoothgrad = _boxcar_smooth(absgrad, smooth_kernel)
    avggrad = _boxcar_smooth(smoothgrad, avg_kernel)
    qrs = smoothgrad > gradthreshweight * avggrad

    # Transitions: beg at i where ~qrs[i] & qrs[i+1]; end at i where qrs[i] & ~qrs[i+1].
    rise = (~qrs[:-1]) & qrs[1:]
    fall = qrs[:-1] & (~qrs[1:])
    idxs = jnp.arange(T - 1)

    def compact(mask, fill):
        # first MAX_SEGMENTS masked indices, ascending — top_k on negated
        # indices (~3x cheaper than the scatter form on TPU,
        # benchmarks/abl_scatter.py)
        key = jnp.where(mask, -idxs, -(T + 1))
        v = jax.lax.top_k(key, MAX_SEGMENTS)[0]
        out = jnp.where(v > -(T + 1), -v, fill).astype(jnp.int32)
        return out, jnp.sum(mask)

    beg_qrs, n_beg = compact(rise, T)
    end_qrs_all, _ = compact(fall, T)
    first_beg = beg_qrs[0]
    # keep only ends strictly after the first beginning
    end_valid = (end_qrs_all > first_beg) & (end_qrs_all < T)
    end_rank = jnp.cumsum(end_valid) - 1
    end_qrs = jnp.full((MAX_SEGMENTS,), T, jnp.int32)
    end_qrs = end_qrs.at[jnp.where(end_valid, end_rank, MAX_SEGMENTS)].set(end_qrs_all, mode="drop")
    n_end = jnp.sum(end_valid)

    num_qrs = jnp.minimum(n_beg, n_end)
    seg_ids = jnp.arange(MAX_SEGMENTS)
    seg_valid = seg_ids < num_qrs
    seg_len = jnp.where(seg_valid, end_qrs - beg_qrs, 0)
    min_len = jnp.sum(seg_len) / jnp.maximum(num_qrs, 1) * minlenweight

    # --- prominence of every position as a candidate peak --------------------
    # Local maxima (strict; plateaus of width>1 are vanishingly rare in
    # filtered float data and are resolved to the left edge).
    is_locmax = jnp.zeros((T,), bool)
    is_locmax = is_locmax.at[1:-1].set((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:]))

    # Segment membership in POSITION space (no searchsorted, no (T,)
    # gathers): rises and valid falls strictly alternate (transitions of a
    # boolean signal; leading falls are filtered), so the containing
    # segment's beg is a forward cummax fill of valid rise positions and its
    # end a reverse cummin fill of valid fall positions, and the segment
    # ordinal is a running count of valid rises.
    pos = jnp.arange(T)
    rise_f = jnp.concatenate([rise, jnp.zeros((1,), bool)])  # align to T
    fall_f = jnp.concatenate([fall, jnp.zeros((1,), bool)])
    n_seg_cap = jnp.minimum(num_qrs, MAX_SEGMENTS)  # compact() drops beyond
    rise_ord = jnp.cumsum(rise_f) - 1  # ordinal of the last rise at/before p
    valid_rise = rise_f & (rise_ord < n_seg_cap)
    fall_after = fall_f & (pos > first_beg)
    fall_ord = jnp.cumsum(fall_after) - 1
    valid_fall = fall_after & (fall_ord < n_seg_cap)

    last_beg = jax.lax.cummax(jnp.where(valid_rise, pos, -1))
    next_end = jax.lax.cummin(jnp.where(valid_fall, pos, T)[::-1])[::-1]
    in_seg = last_beg > jax.lax.cummax(jnp.where(valid_fall, pos, -1))
    # find_peaks runs on the slice [beg, end): interior maxima only.
    cand = is_locmax & in_seg & (pos > last_beg) & (pos < next_end - 1)

    # --- candidate compaction -----------------------------------------------
    # Prominence walks run only at candidate local maxima, not all T
    # positions.  This turns the dominant cost of the detector (15-level
    # sparse-table walks, formerly 2D gathers over all 10 000 positions)
    # into 1D row gathers over the candidate slots; the slot count is the
    # provable (T-1)//2+1 bound computed above, so the compaction can never
    # drop a real candidate.
    cand_rank = jnp.cumsum(cand) - 1
    ci = jnp.full((max_candidates,), T, jnp.int32)
    ci = ci.at[jnp.where(cand, cand_rank, max_candidates)].set(pos, mode="drop")
    cvalid = ci < T
    cis = jnp.clip(ci, 0, T - 1)
    cv = x[cis]
    seg_c = jnp.clip(rise_ord[cis], 0, MAX_SEGMENTS - 1).astype(jnp.int32)
    clo = jnp.where(cvalid, last_beg[cis], 0)
    chi = jnp.where(cvalid, next_end[cis] - 1, 0)

    maxt, mint = _sparse_tables(x, levels)
    lstop = _nearest_higher(maxt, cis, cv, clo, chi, levels, left=True)
    rstop = _nearest_higher(maxt, cis, cv, clo, chi, levels, left=False)
    # left base min: min over [max(lstop, lo), p]; walked region excludes the
    # higher stop point itself but the query including a strictly higher point
    # never changes a min, so clamping to the segment border is safe.
    lmin = _range_query(mint, jnp.clip(jnp.maximum(lstop, clo), 0, T - 1), cis, False)
    rmin = _range_query(mint, cis, jnp.clip(jnp.minimum(rstop, chi), 0, T - 1), False)
    cprom = jnp.where(cvalid, cv - jnp.maximum(lmin, rmin), -jnp.inf)

    # --- best candidate per segment ------------------------------------------
    seg_best = jnp.full((MAX_SEGMENTS,), -jnp.inf)
    seg_best = seg_best.at[jnp.where(cvalid, seg_c, MAX_SEGMENTS)].max(cprom, mode="drop")
    # argmax: first position achieving the segment max (scipy argmax tie-break)
    is_best = cvalid & (cprom == seg_best[seg_c])
    seg_peak = jnp.full((MAX_SEGMENTS,), T, jnp.int32)
    seg_peak = seg_peak.at[jnp.where(is_best, seg_c, MAX_SEGMENTS)].min(ci, mode="drop")

    seg_has_peak = seg_valid & (seg_len >= min_len) & (seg_peak < T)

    # --- sequential min-delay acceptance (includes the virtual peak at 0) ----
    def accept(carry, inp):
        last, = carry
        peak, has = inp
        take = has & (peak - last > mindelay)
        new_last = jnp.where(take, peak, last)
        return (new_last,), jnp.where(take, peak, -1)

    (_,), accepted = jax.lax.scan(accept, (jnp.int32(0),), (seg_peak, seg_has_peak))

    # compact accepted peaks into the output buffer
    acc_mask = accepted >= 0
    rank = jnp.cumsum(acc_mask) - 1
    peaks = jnp.full((max_peaks,), -1, jnp.int32)
    peaks = peaks.at[jnp.where(acc_mask, rank, max_peaks)].set(accepted, mode="drop")
    n_peaks = jnp.sum(acc_mask)
    return peaks, n_peaks


@functools.partial(jax.jit, static_argnames=("sampling_rate", "max_peaks"))
def find_rpeaks_batch(signals: jnp.ndarray, sampling_rate: int = 500, max_peaks: Optional[int] = None):
    """vmap of :func:`find_rpeaks` over a (B, T) batch.

    Two-tier dispatch: a cheap pre-pass counts strict interior local maxima
    per window (an upper bound on prominence candidates, which are the
    in-QRS-segment subset).  If every window fits LIGHT_CANDIDATES slots the
    light program runs (walks over 1024 slots); otherwise the provable-bound
    program does.  ``lax.cond`` sits OUTSIDE the vmap, so only the selected
    branch executes — under vmap it would decay to a both-branches select.
    Results are identical either way; only the walk buffer width differs.
    """
    x = signals.astype(jnp.float32)
    T = x.shape[1]
    provable = (T - 1) // 2 + 1
    if provable <= LIGHT_CANDIDATES:
        return jax.vmap(lambda s: find_rpeaks(s, sampling_rate, max_peaks))(x)

    interior = (x[:, 1:-1] > x[:, :-2]) & (x[:, 1:-1] > x[:, 2:])
    worst = jnp.max(jnp.sum(interior, axis=1))

    def light(s):
        return jax.vmap(
            lambda w: find_rpeaks(w, sampling_rate, max_peaks, candidate_slots=LIGHT_CANDIDATES)
        )(s)

    def heavy(s):
        return jax.vmap(lambda w: find_rpeaks(w, sampling_rate, max_peaks))(s)

    return jax.lax.cond(worst <= LIGHT_CANDIDATES, light, heavy, x)
