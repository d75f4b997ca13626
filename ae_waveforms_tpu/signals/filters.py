"""Z-score and zero-phase Butterworth filtering.

TPU-native design
-----------------
An IIR filter is a linear recurrence ``s[t] = A s[t-1] + c x[t]`` over a
4-dimensional direct-form-II-transposed state.  Instead of a sequential
``lax.scan`` (latency-bound: one tiny op per sample for multi-hour 500 Hz
records), we expose the recurrence as an *associative* composition of affine
maps and evaluate it with ``jax.lax.associative_scan`` — log-depth, fully
parallel on the VPU.  The zero-phase pass is the same kernel run on the
reversed sequence.

Parity
------
Matches ``scipy.signal.filtfilt(b, a, x)`` defaults used by the reference
(data_load_preprocess/filters.py:31-53): odd-reflection padding with
``padlen = 3 * max(len(a), len(b))``, Gustafsson-free 'pad' method, and
``lfilter_zi``-scaled initial conditions.  NaN gaps are handled exactly like
the reference: each non-NaN segment is filtered independently and segments of
length <= padlen are passed through unfiltered.

Coefficient design (``scipy.signal.butter``) runs on host; the reference also
treats filter design as a host-side constant.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

__all__ = ["zscore", "butter_coefficients", "filtfilt", "butterworth", "butterworth_batched"]


def zscore(data):
    """NaN-aware z-score (reference: filters.py:5-12).

    Works on numpy or jax arrays; reduction over all elements.
    """
    xp = jnp if isinstance(data, jnp.ndarray) else np
    return (data - xp.nanmean(data)) / xp.nanstd(data)


@functools.lru_cache(maxsize=32)
def butter_coefficients(
    order: int, cutoff_hz: float, btype: str, fs: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Butterworth (b, a) plus steady-state initial conditions ``zi``.

    Host-side, cached: pure constants for a given (order, cutoff, type, fs).
    """
    nyquist = 0.5 * fs
    b, a = scipy.signal.butter(N=order, Wn=cutoff_hz / nyquist, btype=btype, analog=False)
    zi = scipy.signal.lfilter_zi(b, a)
    return b, a, zi


@functools.lru_cache(maxsize=32)
def butter_sos(order: int, cutoff_hz: float, btype: str, fs: float) -> Tuple[np.ndarray, np.ndarray]:
    """Second-order-section form plus per-section steady-state ``zi``.

    The device kernel runs the IIR as a cascade of 2nd-order sections: the
    affine prefix products of a stiff 4th-order companion matrix overflow
    float32 (huge non-normal transients for poles near the unit circle),
    while each biquad's transients stay bounded by ~1/sin(pole angle).
    With steady-state initialisation the cascade output equals the ba-form
    ``lfilter`` output exactly in real arithmetic.
    """
    nyquist = 0.5 * fs
    sos = scipy.signal.butter(N=order, Wn=cutoff_hz / nyquist, btype=btype, analog=False, output="sos")
    zi = scipy.signal.sosfilt_zi(sos)  # (n_sections, 2), unit-constant-input steady state
    return sos, zi


def _affine_ops(b: np.ndarray, a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Build (A, c) for the DF2T state recurrence s' = A s + c x.

    DF2T with normalized a0=1, state z[0..n-1]:
        y    = b0 x + z0
        z_k' = b_{k+1} x + z_{k+1} - a_{k+1} y     (z_n := 0)
    Substituting y gives the affine form.
    """
    n = max(len(a), len(b)) - 1
    b = np.concatenate([b, np.zeros(n + 1 - len(b))])
    a = np.concatenate([a, np.zeros(n + 1 - len(a))])
    A = np.zeros((n, n))
    c = np.zeros(n)
    for k in range(n):
        if k + 1 < n:
            A[k, k + 1] = 1.0
        A[k, 0] += -a[k + 1]
        c[k] = b[k + 1] - a[k + 1] * b[0]
    return A, c


@functools.lru_cache(maxsize=64)
def _modal_form(b: tuple, a: tuple):
    """Host-side modal decomposition of the biquad state map A = V M V^-1.

    For the complex pole pair (the case for every Butterworth LP/HP biquad)
    M is the scaled rotation r R(theta), whose l-th power has the closed form
    r^l R(l theta).  Running the scan in modal coordinates keeps every prefix
    transition a scaled rotation computed *directly from the block length*
    instead of accumulated through matrix products — this is what makes the
    parallel form match sequential float32 accuracy even for the stiff 1 Hz
    high-pass whose poles sit ~4e-3 from the unit circle.
    """
    A, c = _affine_ops(np.asarray(b), np.asarray(a))
    assert A.shape == (2, 2), "modal scan is specialised to biquads"
    w, U = np.linalg.eig(A)
    if abs(w[0].imag) < 1e-12:
        return None  # real poles: caller falls back to the generic scan
    i = 0 if w[0].imag > 0 else 1
    lam, u = w[i], U[:, i]
    V = np.stack([u.real, u.imag], axis=1)  # A V = V [[a, b], [-b, a]]
    Vinv = np.linalg.inv(V)
    r = np.abs(lam)
    theta = np.arctan2(lam.imag, lam.real)
    return V, Vinv @ c, float(np.log(r)), float(theta)


def _modal_scan(vs: jnp.ndarray, s0_modal: jnp.ndarray, log_r: float, theta: float) -> jnp.ndarray:
    """Inclusive modal-state trajectory for s_t = M s_{t-1} + v_t with
    M = r R(theta): prefix transitions computed in closed form from block
    lengths.  vs: (T, 2) per-step inputs in modal coordinates."""
    T = vs.shape[0]
    dtype = vs.dtype

    def rot_apply(length, v):
        """(r e^{i theta})^length applied to v — closed form, no error
        accumulation.  Blocks long enough for r^l to underflow carry no
        transient anyway (the filter forgets), so the large-angle regime is
        harmless."""
        length = length.astype(dtype)
        scale = jnp.exp(length * log_r)
        ang = length * theta
        cs, sn = jnp.cos(ang), jnp.sin(ang)
        return scale[..., None] * jnp.stack(
            [cs * v[..., 0] + sn * v[..., 1], -sn * v[..., 0] + cs * v[..., 1]], axis=-1
        )

    lens = jnp.ones((T,), jnp.int32)

    def combine(e1, e2):
        v1, l1 = e1
        v2, l2 = e2
        return rot_apply(l2, v1) + v2, l1 + l2

    vp, _ = jax.lax.associative_scan(combine, (vs, lens))
    t_idx = jnp.arange(1, T + 1)
    return rot_apply(t_idx, jnp.broadcast_to(s0_modal, (T, 2))) + vp


def _parallel_lfilter(x: jnp.ndarray, b, a, s0: jnp.ndarray) -> jnp.ndarray:
    """lfilter via associative scan.  x: (T,), s0: (n,) DF2T state.

    No iterative refinement: the error recurrence e_t = A e_{t-1} + r_t
    amplifies i.i.d. residual noise by ~1/(1-|pole|) (~1000x for the 1 Hz
    high-pass), so even an error-free-transformation residual accurate to
    ~4e-8 yields a ~4e-5 correction — worse than the ~3e-7 unrefined error.
    Refinement would need an f64 residual, i.e. just running the f64 path.
    """
    modal = _modal_form(tuple(np.asarray(b)), tuple(np.asarray(a)))
    dtype = x.dtype
    b0 = jnp.asarray(b[0], dtype)
    if modal is None:
        return _parallel_lfilter_generic(x, b, a, s0)
    V, c_t, log_r, theta = modal
    Vj = jnp.asarray(V, dtype)

    vs = jnp.asarray(c_t, dtype)[None, :] * x[:, None]
    s0_t = jnp.asarray(np.linalg.inv(V), dtype) @ s0
    s_modal = _modal_scan(vs, s0_t, log_r, theta)

    # back to DF2T coordinates; y[t] = b0 x[t] + s[t-1][0]
    V0 = Vj[0]
    s_row0 = s_modal @ V0
    s_prev0 = jnp.concatenate([s0[None, 0], s_row0[:-1]])
    return b0 * x + s_prev0


def _parallel_lfilter_generic(x: jnp.ndarray, b, a, s0: jnp.ndarray) -> jnp.ndarray:
    """Affine matrix-product scan (any order); used when the modal form does
    not apply (real poles)."""
    A, c = _affine_ops(np.asarray(b), np.asarray(a))
    n = A.shape[0]
    dtype = x.dtype
    A = jnp.asarray(A, dtype)
    c = jnp.asarray(c, dtype)
    b0 = jnp.asarray(b[0], dtype)

    Ms = jnp.broadcast_to(A, (x.shape[0], n, n))
    vs = c[None, :] * x[:, None]

    def combine(e1, e2):
        M1, v1 = e1
        M2, v2 = e2
        return M2 @ M1, jnp.einsum("...ij,...j->...i", M2, v1) + v2

    Mp, vp = jax.lax.associative_scan(combine, (Ms, vs))
    s = jnp.einsum("tij,j->ti", Mp, s0) + vp
    s_prev0 = jnp.concatenate([s0[None, 0], s[:-1, 0]])
    return b0 * x + s_prev0


def _parallel_sosfilt(x: jnp.ndarray, sos: np.ndarray, zi_rows: np.ndarray, x0: jnp.ndarray) -> jnp.ndarray:
    """Cascade of biquads, each evaluated with the affine associative scan.

    ``zi_rows * x0`` seeds each section with the steady-state response to a
    constant input equal to the first extended sample; ``sosfilt_zi`` already
    folds the cumulative section DC gains into the rows (scipy semantics)."""
    y = x
    for s in range(sos.shape[0]):
        b = sos[s, :3]
        a = sos[s, 3:]
        y = _parallel_lfilter(y, b, a, jnp.asarray(zi_rows[s], x.dtype) * x0)
    return y


def _odd_ext(x: jnp.ndarray, padlen: int) -> jnp.ndarray:
    """scipy.signal.odd_ext: odd reflection about the first/last samples."""
    left = 2 * x[0] - x[1 : padlen + 1][::-1]
    right = 2 * x[-1] - x[-padlen - 1 : -1][::-1]
    return jnp.concatenate([left, x, right])


def filtfilt(x: jnp.ndarray, sos: np.ndarray, zi_rows: np.ndarray, padlen: int) -> jnp.ndarray:
    """Zero-phase forward-backward IIR, scipy ``filtfilt(b, a, x)`` semantics
    (odd extension, ba-form padlen, steady-state zi) evaluated as a biquad
    cascade of parallel scans.

    x must be NaN-free and longer than padlen.
    """
    ext = _odd_ext(x, padlen)
    y = _parallel_sosfilt(ext, sos, zi_rows, ext[0])
    y = y[::-1]
    y = _parallel_sosfilt(y, sos, zi_rows, y[0])
    y = y[::-1]
    return y[padlen:-padlen]


@functools.partial(jax.jit, static_argnames=("order", "cutoff_hz", "btype", "fs"))
def _filtfilt_fullseg(x, order, cutoff_hz, btype, fs):
    sos, zi = butter_sos(order, cutoff_hz, btype, fs)
    padlen = 3 * (order + 1)  # == 3 * max(len(a), len(b)) for the ba form
    return filtfilt(x, sos, zi, padlen)


def _dyn_gather(x, idx):
    return x[jnp.clip(idx, 0, x.shape[0] - 1)]


@functools.partial(jax.jit, static_argnames=("order", "cutoff_hz", "btype", "fs"))
def filtfilt_fixed(x: jnp.ndarray, n_valid, order, cutoff_hz, btype, fs):
    """Fixed-shape filtfilt: x is a zero-padded buffer of static length N
    with ``n_valid`` real samples.  The odd extension, both filter passes and
    the reversals are built from dynamic gathers, so one compilation serves
    every segment length in a bucket — the device extraction path never
    recompiles per record/segment length.

    Returns an (N,) buffer whose first n_valid entries are the filtered
    segment (positions beyond are unspecified)."""
    sos, zi_rows = butter_sos(order, cutoff_hz, btype, fs)
    padlen = 3 * (order + 1)
    N = x.shape[0]
    L = n_valid
    M = L + 2 * padlen  # extended length

    p = jnp.arange(N + 2 * padlen)
    # odd extension with dynamic valid length
    left = 2 * x[0] - _dyn_gather(x, padlen - p)
    mid = _dyn_gather(x, p - padlen)
    right = 2 * _dyn_gather(x, L - 1) - _dyn_gather(x, 2 * L + padlen - 2 - p)
    ext = jnp.where(p < padlen, left, jnp.where(p < padlen + L, mid, jnp.where(p < M, right, 0.0)))

    y = _parallel_sosfilt(ext, sos, zi_rows, ext[0])
    # dynamic-length reversal: rev[p] = y[M-1-p]
    y = jnp.where(p < M, _dyn_gather(y, M - 1 - p), 0.0)
    y = _parallel_sosfilt(y, sos, zi_rows, y[0])
    y = jnp.where(p < M, _dyn_gather(y, M - 1 - p), 0.0)
    return y[padlen : padlen + N]


@functools.partial(jax.jit, static_argnames=("order", "hp_hz", "lp_hz", "fs"))
def _filtfilt_chain_batch(xs, ns, order, hp_hz, lp_hz, fs):
    """Zero-phase HP then LP over a batch of padded segments in one program.

    Composes two ``filtfilt_fixed`` passes inside one vmap: the HP output
    never leaves the device, and a whole bucket of segments (pooled across
    records/cases) filters in a single dispatch — the per-record two-dispatch
    cost that dominated batched extraction through the tunnelled relay
    collapses to one dispatch per length bucket."""

    def one(x, n):
        y = x
        if hp_hz is not None:
            y = filtfilt_fixed(y, n, order, hp_hz, "high", fs)
        if lp_hz is not None:
            y = filtfilt_fixed(y, n, order, lp_hz, "low", fs)
        return y

    return jax.vmap(one)(xs, ns)


def butterworth_batched(
    records: "list[np.ndarray]",
    hp_hz: Optional[float],
    lp_hz: Optional[float],
    sampling_frequency: float = 500,
    filter_order: int = 4,
) -> "list[np.ndarray]":
    """NaN-segmented zero-phase HP+LP over MANY records at once (float32
    device path).  Segment boundaries, the short-segment pass-through rule,
    and NaN preservation match ``butterworth`` exactly (reference:
    filters.py:15-55 applied twice); the per-segment numerics are the same
    ``filtfilt_fixed`` kernel composition, so outputs are bitwise equal to
    calling ``butterworth(.., "high", ..)`` then ``butterworth(.., "low", ..)``
    per record.  Segments from all records are pooled and grouped by
    power-of-two length bucket; each bucket is ONE device dispatch."""
    if hp_hz is None and lp_hz is None:
        return [np.asarray(r, np.float32) for r in records]
    ref_cut = hp_hz if hp_hz is not None else lp_hz
    b, a, _ = butter_coefficients(
        filter_order, float(ref_cut), "high" if hp_hz is not None else "low", float(sampling_frequency)
    )
    thresh = 3 * max(len(a), len(b))

    outs = [np.full(len(r), np.nan, np.float32) for r in records]
    groups: dict = {}  # bucket -> [(record_idx, start, end)]
    for ri, data in enumerate(records):
        data = np.asarray(data)
        if len(data) == 0:
            continue
        isnan = np.isnan(data)
        seg_start = np.where(isnan[:-1] & ~isnan[1:])[0] + 1
        seg_end = np.where(~isnan[:-1] & isnan[1:])[0] + 1
        if not isnan[0]:
            seg_start = np.insert(seg_start, 0, 0)
        if not isnan[-1]:
            seg_end = np.append(seg_end, len(data))
        for start, end in zip(seg_start, seg_end):
            n = int(end - start)
            if n <= thresh:
                outs[ri][start:end] = data[start:end]
            else:
                bucket = 1 << max(10, int(np.ceil(np.log2(n))))
                groups.setdefault(bucket, []).append((ri, int(start), int(end)))

    for bucket, items in sorted(groups.items()):
        # row count padded to a multiple of 8 so the program-shape set stays
        # closed (persistent-cache-friendly) however many segments a chunk has
        rows = ((len(items) + 7) // 8) * 8
        bufs = np.zeros((rows, bucket), np.float32)
        ns = np.full(rows, bucket, np.int32)  # pad rows: filter zeros, discard
        for k, (ri, s, e) in enumerate(items):
            bufs[k, : e - s] = records[ri][s:e]
            ns[k] = e - s
        ys = np.asarray(
            _filtfilt_chain_batch(
                jnp.asarray(bufs),
                jnp.asarray(ns),
                filter_order,
                None if hp_hz is None else float(hp_hz),
                None if lp_hz is None else float(lp_hz),
                float(sampling_frequency),
            )
        )
        for k, (ri, s, e) in enumerate(items):
            outs[ri][s:e] = ys[k, : e - s]
    return outs


def butterworth(
    data: np.ndarray,
    btype: str,
    cutoff_frequency: float,
    sampling_frequency: float = 500,
    filter_order: int = 4,
    precision: str = "float32",
) -> np.ndarray:
    """NaN-segmented zero-phase Butterworth (reference: filters.py:15-55).

    Splits the record at NaN gaps, filters each non-NaN segment separately,
    passes through segments with ``len <= 3*max(len(a), len(b))`` unchanged,
    and reassembles with NaNs preserved.

    precision="float64" runs the exact scipy host path (bit-parity oracle for
    the driver's 1e-5 ``np_waves`` target); "float32" runs the parallel TPU
    kernel.
    """
    data = np.asarray(data)
    b, a, zi = butter_coefficients(filter_order, float(cutoff_frequency), btype, float(sampling_frequency))
    thresh = 3 * max(len(a), len(b))

    out = np.full_like(data, np.nan, dtype=np.float64 if precision == "float64" else np.float32)
    isnan = np.isnan(data)
    # Segment boundaries exactly as the reference computes them (filters.py:37-45).
    seg_start = np.where(isnan[:-1] & ~isnan[1:])[0] + 1
    seg_end = np.where(~isnan[:-1] & isnan[1:])[0] + 1
    if not isnan[0]:
        seg_start = np.insert(seg_start, 0, 0)
    if not isnan[-1]:
        seg_end = np.append(seg_end, len(data))

    for start, end in zip(seg_start, seg_end):
        seg = data[start:end]
        n = end - start
        if n <= thresh:
            out[start:end] = seg
        elif precision == "float64":
            out[start:end] = scipy.signal.filtfilt(b, a, seg.astype(np.float64))
        else:
            # bucket the segment length so the fixed-shape kernel compiles
            # once per power-of-two bucket, not per length
            bucket = 1 << max(10, int(np.ceil(np.log2(n))))
            buf = np.zeros(bucket, np.float32)
            buf[:n] = seg
            y = filtfilt_fixed(
                jnp.asarray(buf), n, filter_order, float(cutoff_frequency), btype, float(sampling_frequency)
            )
            out[start:end] = np.asarray(y)[:n]
    return out
