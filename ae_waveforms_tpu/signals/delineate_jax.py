"""Batched DWT delineation on device — the vmapped twin of
``signals.delineate`` (same algorithm, fixed shapes, masked searches).

Everything the host version does per beat with python loops becomes a
masked reduction over a fixed search window:

- "last/first slope peak"            -> masked max/min of local-max indices
- "first zero crossing after p"      -> reverse-cummin next-crossing index
- "next retained modulus maximum"    -> reverse-cummin next-peak index
- "last/first threshold candidate"   -> masked max/min index

The per-window cost is O(K beats x W window) VPU work; the whole batch of
20-s windows delineates in one device call.  Equality with the host
implementation (exact integer fiducial indices / NaNs) is enforced by
tests/test_delineate_jax.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["delineate_batch", "ANALYSIS_RATE", "W"]

ANALYSIS_RATE = 2000
W = 1280  # fixed search-window length (>= the longest 0.6 s onset window)
BIG = 10**9

# the longest search window is the 0.6 s T-onset lookback at the analysis rate
assert W >= int(0.6 * ANALYSIS_RATE), "W must cover the T-onset search window"


def _resample4(x: jnp.ndarray) -> jnp.ndarray:
    """Linear resample by exactly 4x (500 Hz -> 2000 Hz), matching
    np.interp over endpoint=False grids.

    Gather-free: out[4i+j] = (1-j/4) x[i] + (j/4) x[i+1] as a broadcast over
    the (T, 4) grid (TPU gathers run orders of magnitude below VPU rate)."""
    n_in = x.shape[0]
    x_next = jnp.concatenate([x[1:], x[-1:]])
    w = (jnp.arange(4, dtype=x.dtype) * 0.25)[None, :]
    out = x[:, None] * (1 - w) + x_next[:, None] * w
    return out.reshape(4 * n_in)


def _dwt_scales(x: jnp.ndarray, max_degree: int = 9, needed=None) -> dict:
    """Detail signals of the a-trous quadratic-spline bank as a dict
    ``{scale: (T,) array}``.

    The host computation lets intermediate approximations grow (full
    convolutions feeding later scales near the tail); running every scale on
    a zero-padded extended buffer reproduces exactly the entries that
    survive the final trim to T.

    ``needed``: iterable of scale indices to emit (default: all).  The
    delineator only consumes scales ``2 + deg`` and ``3 + deg`` (5 and 6 at
    the 2 kHz analysis rate), so skipping the rest drops both the detail
    materialisation and the deeper approximation chain."""
    if needed is None:
        needed = range(max_degree)
    needed = set(int(s) for s in needed)
    max_degree = max(needed) + 1
    T = x.shape[0]
    pad = 2048  # covers the 9-scale growth (sum of 3 * 2^deg)
    approx = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    details = {}

    def shifted(a, offset, length):
        """conv-full term a[n - offset] over n in [0, length): a zero-padded
        on the left.  The a-trous taps are all zero except 2 (g) / 4 (h)
        entries, so the dense ~1500-tap jnp.convolve is replaced by these
        shifted adds — same values, same left-to-right summation order as
        np.convolve's ascending-k accumulation (zero terms add exactly 0)."""
        right = max(0, length - offset - a.shape[0])
        return jnp.concatenate(
            [jnp.zeros((offset,), a.dtype), a, jnp.zeros((right,), a.dtype)]
        )[:length]

    for deg in range(max_degree):
        s = 2**deg
        delay = s
        L = len(approx) + 3 * s  # long enough for every trimmed slice below
        a0 = shifted(approx, 0, L)
        a1 = shifted(approx, s, L)
        a2 = shifted(approx, 2 * s, L)
        a3 = shifted(approx, 3 * s, L)
        if deg in needed:
            # g_taps = [2, 0...0, -2] at offsets 0, s
            details[deg] = (2.0 * a0 + (-2.0) * a1)[delay : delay + T]
        if deg + 1 < max_degree:
            # h_taps = [1/8, 0..., 3/8, 0..., 3/8, 0..., 1/8] at 0, s, 2s, 3s
            approx = (((0.125 * a0 + 0.375 * a1) + 0.375 * a2) + 0.125 * a3)[delay : delay + T + pad]
    return details


def _window(sig: jnp.ndarray, start: jnp.ndarray, length: jnp.ndarray, w: int = W) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-``w`` contiguous window sig[start : start+length] with validity
    mask.  A contiguous ``lax.dynamic_slice`` into a zero-padded buffer, NOT
    an elementwise gather: TPU gathers run ~orders of magnitude below VPU
    rate and these windows are taken per beat per fiducial search.

    ``w`` is the static window capacity, sized per search to its maximum
    possible ``length`` (rounded up to the 128-lane width) — every vector op
    downstream of the slice shrinks with it."""
    T = sig.shape[0]
    k = jnp.arange(w)
    idx = start + k
    valid = (k < length) & (idx >= 0) & (idx < T)
    padded = jnp.concatenate([jnp.zeros((w,), sig.dtype), sig, jnp.zeros((w,), sig.dtype)])
    vals = jax.lax.dynamic_slice(padded, (jnp.clip(start, -w, T) + w,), (w,))
    return jnp.where(valid, vals, 0.0), valid


def _local_max_mask(d: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """scipy find_peaks: strictly greater than both neighbours, interior of
    the *valid* region only."""
    up = jnp.zeros_like(valid)
    up = up.at[1:-1].set((d[1:-1] > d[:-2]) & (d[1:-1] > d[2:]))
    interior = valid & jnp.roll(valid, 1) & jnp.roll(valid, -1)
    interior = interior.at[0].set(False)
    interior = interior.at[-1].set(False)
    return up & interior


def _next_index(mask: jnp.ndarray) -> jnp.ndarray:
    """nxt[k] = smallest index >= k with mask, else BIG (reverse cummin).

    flip + ``lax.cummin`` + flip: ~10x faster on TPU than
    ``associative_scan(minimum, reverse=True)`` at these shapes (measured
    189 -> 18 ms for two (256,72,896) scans, benchmarks/abl_tp_micro.py)."""
    idx = jnp.where(mask, jnp.arange(mask.shape[0]), BIG)
    return jax.lax.cummin(idx[::-1])[::-1]


def _masked_last(mask: jnp.ndarray) -> jnp.ndarray:
    """largest index with mask, else -BIG."""
    return jnp.max(jnp.where(mask, jnp.arange(mask.shape[0]), -BIG))


def _masked_first(mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(jnp.where(mask, jnp.arange(mask.shape[0]), BIG))


def _tp_peak_one(ecg, dwt_row, start, length, eps_weight, expected_latency, symmetric, fs, w=W):
    """One beat's T- or P-peak search; returns float index into the analysis
    signal or NaN."""
    d, valid = _window(dwt_row, start, length, w)
    e, _ = _window(ecg, start, length, w)
    n = jnp.sum(valid)
    ok = n > 0

    rms = jnp.sqrt(jnp.sum(jnp.where(valid, d * d, 0.0)) / jnp.maximum(n, 1))
    height = eps_weight * rms
    absd = jnp.abs(d)
    peaks = _local_max_mask(absd, valid) & (absd > height)
    dmax = jnp.max(jnp.where(valid, d, -jnp.inf))
    peaks = peaks & (absd > 0.025 * dmax)
    # prepended virtual peak at 0 when the window opens positive
    peaks = peaks.at[0].set(peaks[0] | (valid[0] & (d[0] > 0)))

    nxt_peak = _next_index(peaks)
    # sign-change positions (np.sign diff != 0 at k means crossing between k, k+1)
    s = jnp.sign(d)
    cross = jnp.zeros((w,), bool).at[:-1].set((s[1:] - s[:-1]) != 0)
    cross = cross & valid & jnp.roll(valid, -1)
    nxt_cross = _next_index(cross)

    k = jnp.arange(w)
    # nxt_peak[k+1] is a unit shift, not a gather
    partner = jnp.concatenate([nxt_peak[1:], jnp.full((1,), BIG, nxt_peak.dtype)])
    # "d at the partner peak is negative" without the (w,)-wide value gather
    # (take_along_axis at these shapes costs ~240 ms/batch): the next peak is
    # negative iff the next NEGATIVE peak is the next peak.
    nxt_neg = _next_index(peaks & (d < 0))
    partner_neg = jnp.concatenate([nxt_neg[1:], jnp.full((1,), BIG, nxt_neg.dtype)])
    cand = peaks & (partner < BIG) & (d > 0) & (partner_neg == partner)
    idx_zero = nxt_cross  # first crossing at/after the positive peak
    cand = cand & (idx_zero <= partner) & (idx_zero < w)

    # Crossing-bucket argmax.  score[k] = e[iz[k]] - penalty(iz[k]) depends
    # ONLY on the crossing index iz[k], and every candidate k with the same
    # next crossing c shares it, so "argmax score over candidates, then take
    # its crossing" equals "argmax of g[c] = e[c] - penalty(c) over HIT
    # crossings" (buckets are ordered in k, so the first-max tie-break picks
    # the same crossing).  A crossing c is hit iff some candidate lies in
    # (previous crossing, c].  This removes the (w,)-wide e[iz] value gather
    # (~240 ms/batch at these shapes, benchmarks/abl_tp_micro.py).
    last_cand_le = jax.lax.cummax(jnp.where(cand, k, -1))
    last_cross_le = jax.lax.cummax(jnp.where(cross, k, -1))
    prev_cross_lt = jnp.concatenate(
        [jnp.full((1,), -1, last_cross_le.dtype), last_cross_le[:-1]]
    )
    hit = cross & (last_cand_le > prev_cross_lt)
    latency_c = k.astype(d.dtype) / fs - expected_latency
    penalty_c = jnp.abs(latency_c) if symmetric else latency_c
    g = jnp.where(hit, e - penalty_c, -jnp.inf)
    best_c = jnp.argmax(g)
    found = ok & jnp.any(hit)
    return jnp.where(found, (best_c + start).astype(jnp.float32), jnp.nan)


def _onset_one(dwt_row, pk, dur, weight, negate, w=W):
    """Last sub-threshold point before the last slope peak in [pk-dur, pk)."""
    start = jnp.maximum(pk - dur, 0)
    length = pk - start
    d, valid = _window(dwt_row, start, length, w)
    d = -d if negate else d
    sp = _local_max_mask(d, valid)
    last_sp = _masked_last(sp)
    has_sp = last_sp >= 0
    eps = weight * d[jnp.clip(last_sp, 0, w - 1)]
    k = jnp.arange(w)
    cands = valid & (k < last_sp) & (d < eps)
    last_c = _masked_last(cands)
    found = has_sp & (last_c >= 0)
    return jnp.where(found, (last_c + start).astype(jnp.float32), jnp.nan)


def _offset_one(dwt_row, pk, dur, weight, negate, w=W):
    """First sub-threshold point after the first slope peak in [pk, pk+dur)."""
    d, valid = _window(dwt_row, pk, dur, w)
    d = -d if negate else d
    sp = _local_max_mask(d, valid)
    first_sp = _masked_first(sp)
    has_sp = first_sp < BIG
    eps = weight * d[jnp.clip(first_sp, 0, w - 1)]
    k = jnp.arange(w)
    cands = valid & (k >= first_sp) & (d < eps)
    first_c = _masked_first(cands)
    found = has_sp & (first_c < BIG)
    return jnp.where(found, (first_c + pk).astype(jnp.float32), jnp.nan)


def _bounded_onset(dwt_row, lo, hi, weight, w=W):
    """QRS-onset pattern over the data-dependent window [lo, hi): negated
    slope peaks, LAST one, eps = weight * value, last candidate before it."""
    length = hi - lo
    d, valid = _window(dwt_row, lo, length, w)
    d = -d
    sp = _local_max_mask(d, valid)
    last_sp = _masked_last(sp)
    has_sp = last_sp >= 0
    eps = weight * d[jnp.clip(last_sp, 0, w - 1)]
    k = jnp.arange(w)
    cands = valid & (k < last_sp) & (d < eps)
    last_c = _masked_last(cands)
    found = has_sp & (last_c >= 0)
    return jnp.where(found, (last_c + lo).astype(jnp.float32), jnp.nan)


def _bounded_offset(dwt_row, lo, hi, weight, w=W):
    length = hi - lo
    d, valid = _window(dwt_row, lo, length, w)
    d = -d
    sp = _local_max_mask(d, valid)
    first_sp = _masked_first(sp)
    has_sp = first_sp < BIG
    eps = weight * d[jnp.clip(first_sp, 0, w - 1)]
    k = jnp.arange(w)
    cands = valid & (k >= first_sp) & (d < eps)
    first_c = _masked_first(cands)
    found = has_sp & (first_c < BIG)
    return jnp.where(found, (first_c + lo).astype(jnp.float32), jnp.nan)


def _argext_window(sig, lo, hi, mode_min=True, w=W):
    """arg-min/max of sig over [lo, hi) as an absolute float index, NaN if
    the window is empty."""
    length = hi - lo
    vals, valid = _window(sig, lo, length, w)
    vals = jnp.where(valid, vals, jnp.inf if mode_min else -jnp.inf)
    k = jnp.argmin(vals) if mode_min else jnp.argmax(vals)
    ok = jnp.any(valid)
    return jnp.where(ok, (k + lo).astype(jnp.float32), jnp.nan)


def _delineate_window(sample: jnp.ndarray, peaks: jnp.ndarray, n_peaks: jnp.ndarray, fs_in: int):
    """One 20-s window: returns dict of (K,) float32 fiducial indices at the
    original rate (NaN padded)."""
    fs = ANALYSIS_RATE
    up = fs // fs_in
    ecg = _resample4(sample.astype(jnp.float32))
    deg = int(np.log2(fs / 250))  # 3
    dwt = _dwt_scales(ecg, 9, needed=(2 + deg, 3 + deg))

    K = peaks.shape[0]
    beat_valid = (jnp.arange(K) < n_peaks) & (peaks >= 0)
    rp = jnp.where(beat_valid, peaks * up, 0).astype(jnp.int32)

    srch_bndry = int(0.5 * 0.13 * fs)  # 130
    t_dur = 2 * int(0.25 * fs)  # 1000
    p_back = 2 * int(0.2 * fs)  # 800

    # static per-search window capacities: max possible length rounded up to
    # the 128-lane width (every vector op in a search scales with these)
    lane = 128
    r128 = lambda n: ((n + lane - 1) // lane) * lane
    W_T = r128(t_dur - srch_bndry)  # 896: T search [r+130, r+1000)
    W_P = r128(p_back - srch_bndry)  # 768: P search [r-800, r-130)
    W_RON = r128(p_back)  # 896: QRS onset [pp, r), pp >= r - 800
    W_ROFF = r128(t_dur)  # 1024: QRS offset [r, tp), tp <= r + 999
    W_ONOFF = r128(int(0.3 * fs))  # 640: P/T 0.3 s onset/offset windows
    W_TON = r128(int(0.6 * fs))  # 1280: T onset 0.6 s lookback

    def per_beat(r):
        # T peak on scale 3+deg, P peak on scale 2+deg
        tpk = _tp_peak_one(
            ecg, dwt[3 + deg], r + srch_bndry, t_dur - srch_bndry, 0.25,
            0.25 - 0.5 * 0.13, False, fs, w=W_T,
        )
        p_start = r - p_back
        p_len = (r - srch_bndry) - p_start
        ppk_raw = _tp_peak_one(ecg, dwt[2 + deg], p_start, p_len, 0.02, 0.2, True, fs, w=W_P)
        ppk = jnp.where(p_start < 0, jnp.nan, ppk_raw)
        return tpk, ppk

    tpeaks, ppeaks = jax.vmap(per_beat)(rp)

    def qrs_bounds(r, pp, tp):
        on = jnp.where(
            jnp.isnan(pp), jnp.nan,
            _bounded_onset(dwt[2 + deg], jnp.nan_to_num(pp).astype(jnp.int32), r, 0.5, w=W_RON),
        )
        off = jnp.where(
            jnp.isnan(tp), jnp.nan,
            _bounded_offset(dwt[2 + deg], r, jnp.nan_to_num(tp).astype(jnp.int32), 0.5, w=W_ROFF),
        )
        return on, off

    r_on, r_off = jax.vmap(qrs_bounds)(rp, ppeaks, tpeaks)

    def tp_bounds(pk, dur_on, dur_off, w_on, w_off, cap_on, cap_off):
        pki = jnp.nan_to_num(pk).astype(jnp.int32)
        on = jnp.where(jnp.isnan(pk), jnp.nan, _onset_one(dwt[2 + deg], pki, dur_on, w_on, False, w=cap_on))
        off = jnp.where(jnp.isnan(pk), jnp.nan, _offset_one(dwt[2 + deg], pki, dur_off, w_off, True, w=cap_off))
        return on, off

    p_on, p_off = jax.vmap(
        lambda pk: tp_bounds(pk, int(0.3 * fs), int(0.3 * fs), 0.4, 0.4, W_ONOFF, W_ONOFF)
    )(ppeaks)
    t_on, t_off = jax.vmap(
        lambda pk: tp_bounds(pk, int(0.6 * fs), int(0.3 * fs), 0.6, 0.4, W_TON, W_ONOFF)
    )(tpeaks)

    def qs(r, on, off):
        q = jnp.where(
            jnp.isnan(on) | (jnp.nan_to_num(on).astype(jnp.int32) >= r),
            jnp.nan,
            _argext_window(ecg, jnp.nan_to_num(on).astype(jnp.int32), r, mode_min=True, w=W_RON),
        )
        s = jnp.where(
            jnp.isnan(off) | (r + 1 >= jnp.nan_to_num(off).astype(jnp.int32)),
            jnp.nan,
            _argext_window(ecg, r + 1, jnp.nan_to_num(off).astype(jnp.int32), mode_min=True, w=W_ROFF),
        )
        return q, s

    q_pk, s_pk = jax.vmap(qs)(rp, r_on, r_off)

    def down(v):
        out = jnp.floor(jnp.nan_to_num(v) * (1.0 / up)).astype(jnp.float32)
        out = jnp.where(jnp.isnan(v) | ~beat_valid, jnp.nan, out)
        return out

    return {
        "ECG_P_Peaks": down(ppeaks),
        "ECG_P_Onsets": down(p_on),
        "ECG_P_Offsets": down(p_off),
        "ECG_Q_Peaks": down(q_pk),
        "ECG_R_Onsets": down(r_on),
        "ECG_R_Offsets": down(r_off),
        "ECG_S_Peaks": down(s_pk),
        "ECG_T_Peaks": down(tpeaks),
        "ECG_T_Onsets": down(t_on),
        "ECG_T_Offsets": down(t_off),
    }


@functools.partial(jax.jit, static_argnames=("fs_in",))
def delineate_batch(
    samples: jnp.ndarray, peaks: jnp.ndarray, n_peaks: jnp.ndarray, fs_in: int = 500
) -> Dict[str, jnp.ndarray]:
    """(B, T) windows + (B, K) padded R peaks -> ten (B, K) fiducial arrays
    at the original rate (float32, NaN for undetected/padded)."""
    return jax.vmap(lambda s, p, n: _delineate_window(s, p, n, fs_in))(samples, peaks, n_peaks)
