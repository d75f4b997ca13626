"""Per-case extraction pipeline (reference: data_extract_vitaldb.py:23-219).

Record -> trim NaN edges -> z-score -> HP(1 Hz) -> LP(30 Hz) -> 20-s windows
-> per-window z-score -> R-peak detection (TPU batch kernel) -> QC filters
-> median beats (TPU batch kernel) -> delineation + 25 median features.

Host code handles I/O and the per-case cache (idempotent, resumable:
one parquet per case, short-circuited on re-run, same as the reference's
``{path_data}/case_ids/{case_id}.parquet`` contract); device kernels handle
every hot loop over the (n_windows, 10000) batch.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np

from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.signals.delineate import delineate
from ae_waveforms_tpu.signals.features import (
    median_feature_row,
    morphology_features,
    relative_to_r,
)
from ae_waveforms_tpu.signals.filters import butterworth, butterworth_batched, zscore
from ae_waveforms_tpu.signals.median_beat import median_beat_batch
from ae_waveforms_tpu.signals.qc import qc_mask
from ae_waveforms_tpu.signals.rpeaks import find_rpeaks_batch
from ae_waveforms_tpu.signals.segment import segment_record

__all__ = ["CaseResult", "extract_case", "extract_cases", "preprocess_record", "preprocess_records_batched"]

#: Stage-time accumulators for the streaming device path, populated only
#: when AE_EXTRACT_PROFILE=1 (zero overhead otherwise).  Keys: filter,
#: segment, dispatch, pull.  Read/reset by benchmarks.
STAGE_T: dict = {}

#: Congestion-replay hook (bench/test only — benchmarks/
#: bench_congestion_replay.py): maps a chunk's dispatch sequence number to
#: an artificial dispatch->result latency in seconds; the streaming
#: pipeline's resolve then blocks until that point, simulating a recorded
#: tunnel-congestion trace.  None (the default) is zero-overhead.
_RESOLVE_LATENCY_HOOK: Optional[Callable[[int], float]] = None

class _stage:
    """Context timer accumulating into STAGE_T[name] when profiling.

    The env var is read per stage entry (one getenv, negligible next to any
    stage body) so profiling can be enabled after this module is imported —
    an import-time snapshot silently produced an empty STAGE_T when the
    caller set AE_EXTRACT_PROFILE post-import."""

    __slots__ = ("name", "t0", "on")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.on = os.environ.get("AE_EXTRACT_PROFILE") == "1"
        if self.on:
            import time

            self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        if self.on:
            import time

            STAGE_T[self.name] = STAGE_T.get(self.name, 0.0) + time.perf_counter() - self.t0
        return False


@dataclass
class CaseResult:
    case_id: int
    waves: np.ndarray  # (n, 320) float32 median beats
    features: np.ndarray  # (n, 35)
    indices: np.ndarray  # (n,) window-end sample indices
    n_windows_raw: int = 0  # before QC


#: light-path beat width for the fused kernel: every downstream stage (QC,
#: median, delineation, features) costs ~linearly in the (B, K) beat grid,
#: and K's provable bound (68 slots for 20 s at the 0.3 s refractory) is
#: ~2.9x the typical beat count.  48 slots cover every window up to HR 144;
#: a chunk containing a faster window is detected from the kernel's returned
#: per-window peak counts and RE-dispatched through the full-width program
#: (a separate executable, loaded lazily — typical runs never pay for it).
K_LIGHT = 48


def _window_batch_kernel_jit():
    """Build (once) the fused per-window pipeline: R peaks -> QC -> median
    beat -> delineation -> features, all inside ONE jitted device program
    returning ONE packed (B, 358) float32 array
    ``[keep, valid, median(320), features(35), n_peaks]``.

    Through a tunnelled accelerator each dispatch/pull costs a ~100 ms relay
    round trip; the unfused path (5 dispatches + host keep-compression
    between them) was relay-bound at ~12 windows/s.  Dropped windows flow
    through the whole pipeline with their keep flag low and are sliced out
    on the host — redundant device compute is far cheaper than a round trip.

    Width selection lives OUTSIDE the program on purpose: putting both the
    light and provable-bound variants behind in-program ``lax.cond``s made
    the executable ~1.6x larger and the per-process relay load 82 s vs the
    20-50 s baseline — more than the runtime win at reference scale.  The
    static args ``candidate_slots`` (R-peak prominence buffer; the caller
    must guarantee the chunk's strict-local-maxima count fits, see
    ``_host_max_locmax``) and ``k_width`` (beat-slot width; overflow is
    detected from the returned n_peaks column and re-dispatched) key one
    single-path executable per profile, so the shipped light program stays
    small and the heavy ones load only if a chunk actually needs them.
    """
    global _WINDOW_BATCH_KERNEL
    if _WINDOW_BATCH_KERNEL is None:
        import functools

        import jax
        import jax.numpy as jnp

        from ae_waveforms_tpu.signals.delineate_jax import delineate_batch
        from ae_waveforms_tpu.signals.features_jax import feature_rows_batch
        from ae_waveforms_tpu.signals.rpeaks import find_rpeaks

        @functools.partial(jax.jit, static_argnames=("fs", "candidate_slots", "k_width"))
        def kernel(samples, fs, pvc_threshold, sd_threshold,
                   candidate_slots=None, k_width=None):
            peaks, n_peaks = jax.vmap(
                lambda w: find_rpeaks(w, fs, candidate_slots=candidate_slots)
            )(samples)
            if k_width is not None and peaks.shape[1] > k_width:
                # caller contract: results for a chunk with any n_peaks >
                # k_width are truncated and must be re-dispatched full-width
                peaks = peaks[:, :k_width]
            keep = qc_mask(samples, peaks, n_peaks, fs, pvc_threshold, sd_threshold)
            medians = median_beat_batch(samples, peaks, n_peaks)
            fid = delineate_batch(samples, peaks, n_peaks, fs)
            rows = feature_rows_batch(samples, peaks, n_peaks, fid, fs)
            valid = n_peaks > 0
            return jnp.concatenate(
                [
                    keep[:, None].astype(jnp.float32),
                    valid[:, None].astype(jnp.float32),
                    medians.astype(jnp.float32),
                    rows.astype(jnp.float32),
                    n_peaks[:, None].astype(jnp.float32),
                ],
                axis=1,
            )

        _WINDOW_BATCH_KERNEL = kernel
    return _WINDOW_BATCH_KERNEL


_WINDOW_BATCH_KERNEL = None


def _host_max_locmax(chunk: np.ndarray) -> int:
    """Largest per-row count of strict interior local maxima — a cheap,
    exact upper bound on the R-peak detector's prominence candidates (the
    in-QRS-segment subset), computed on host to pick the light
    ``candidate_slots`` profile before dispatch."""
    m = (chunk[:, 1:-1] > chunk[:, :-2]) & (chunk[:, 1:-1] > chunk[:, 2:])
    return int(m.sum(axis=1).max()) if len(chunk) else 0


def _pad_batch(arr: np.ndarray, bucket: int = 16):
    """Pad the leading dim to the next multiple of ``bucket`` (zero rows);
    returns (padded, n_real)."""
    n = len(arr)
    target = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    if target == n:
        return arr, n
    pad = np.zeros((target - n, *arr.shape[1:]), arr.dtype)
    return np.concatenate([arr, pad], axis=0), n


def _trim_zscore(record: np.ndarray, dtype) -> np.ndarray:
    """NaN-edge trim + global z-score, shared by the per-record and batched
    preprocess paths."""
    finite = ~np.isnan(record)
    if not finite.any():
        return np.asarray(record[:0], dtype)
    start = int(np.argmax(finite))
    end = len(record) - int(np.argmax(finite[::-1]))
    return np.asarray(zscore(np.asarray(record[start:end], dtype)), dtype)


def preprocess_record(record: np.ndarray, cfg: ExtractionConfig) -> np.ndarray:
    """Trim NaN edges, z-score, zero-phase HP+LP (data_extract_vitaldb.py:53-78).

    With the default ``filter_backend="host"`` the float32 path runs the
    same exact scipy filtfilt chain as float64 (in f64 math, cast back to
    f32), so f32 extraction differs from the parity oracle only by the
    final cast; ``filter_backend="device"`` selects the modal-scan device
    kernel (<=1e-6 vs scipy; rationale + measurements: core/config.py)."""
    if cfg.precision == "float64":
        rec = _trim_zscore(record, np.float64)
        if cfg.butter_hp_ecg:
            rec = butterworth(rec, "high", cfg.butter_hp_ecg, cfg.sampling_frequency, cfg.butter_order, "float64")
        if cfg.butter_lp_ecg:
            rec = butterworth(rec, "low", cfg.butter_lp_ecg, cfg.sampling_frequency, cfg.butter_order, "float64")
        return rec
    rec = _trim_zscore(record, np.float32)
    fp = "float64" if cfg.filter_backend == "host" else "float32"
    if cfg.butter_hp_ecg:
        rec = butterworth(rec, "high", cfg.butter_hp_ecg, cfg.sampling_frequency, cfg.butter_order, fp)
    if cfg.butter_lp_ecg:
        rec = butterworth(rec, "low", cfg.butter_lp_ecg, cfg.sampling_frequency, cfg.butter_order, fp)
    return np.asarray(rec, np.float32)


def _check_resample(cfg: ExtractionConfig) -> None:
    if cfg.delineation_resample != "linear" and cfg.delineation_engine != "python":
        raise ValueError(
            f"delineation_resample={cfg.delineation_resample!r} is a python-engine "
            "sensitivity probe; the native/device engines implement the 'linear' "
            "contract only (signals/delineate.py RESAMPLE_METHODS)"
        )


def _feature_rows(
    samples: np.ndarray,
    peak_lists: List[List[int]],
    cfg: ExtractionConfig,
    peaks_padded: Optional[np.ndarray] = None,
    n_peaks: Optional[np.ndarray] = None,
) -> (np.ndarray, np.ndarray):
    """Delineation + per-sample 35-feature rows (float64 host path).

    Delineation runs through the index-exact C++ kernel when the native
    library is available (built on demand from native/delineate.cpp),
    falling back to the pure-Python implementation.

    Mirrors data_extract_vitaldb.py:118-169: a delineation exception yields an
    all-NaN row but *keeps* the sample; a beat-count mismatch (cannot happen
    in our fixed-shape delineator, kept for contract completeness) drops it.
    """
    n = len(samples)
    rows = np.full((n, 35), np.nan)
    valid = np.ones(n, bool)

    _check_resample(cfg)

    native_fids = None
    if peaks_padded is not None and n > 0:
        try:
            from native import delineate_batch_native

            native_fids = delineate_batch_native(
                np.asarray(samples, np.float64), peaks_padded, n_peaks, cfg.sampling_frequency
            )
        except Exception:
            native_fids = None

    for i in range(n):
        r_peaks = peak_lists[i]
        if len(r_peaks) == 0:
            valid[i] = False
            continue
        if native_fids is not None:
            fid = {
                k: [np.nan if np.isnan(v) else int(v) for v in native_fids[k][i][: len(r_peaks)]]
                for k in native_fids
            }
        else:
            try:
                fid = delineate(
                    samples[i], r_peaks, cfg.sampling_frequency,
                    resample_method=cfg.delineation_resample,
                )
            except Exception:
                continue  # parity: bare-except -> NaN row, sample kept
        if not all(len(fid[k]) == len(r_peaks) for k in fid):
            valid[i] = False
            continue
        rel = relative_to_r(samples[i], fid, r_peaks, cfg.sampling_frequency)
        morph = morphology_features(rel, len(r_peaks))
        rows[i] = median_feature_row(rel, morph)
    return rows, valid


def extract_case(
    case_id: int,
    record: np.ndarray,
    cfg: ExtractionConfig,
    cache_dir: Optional[str] = None,
) -> CaseResult:
    """Run the full pipeline for one record; optionally cached per case."""
    _check_resample(cfg)
    if cache_dir is not None:
        path = os.path.join(cache_dir, f"{case_id}.npz")
        if os.path.exists(path):
            z = np.load(path)
            return CaseResult(case_id, z["waves"], z["features"], z["indices"], int(z["n_raw"]))

    rec = preprocess_record(record, cfg)
    samples, indices = segment_record(rec, cfg.sampling_frequency, cfg.sample_length)
    n_raw = len(samples)
    if n_raw == 0:
        empty = CaseResult(case_id, np.zeros((0, 320), np.float32), np.zeros((0, 35)), np.zeros((0,)), 0)
        if cache_dir is not None:
            _save_case(cache_dir, case_id, empty)
        return empty

    # per-window z-score (apply_along_axis(zscore, 1, ...) equivalent)
    with np.errstate(all="ignore"):
        mu = np.nanmean(samples, axis=1, keepdims=True)
        sd = np.nanstd(samples, axis=1, keepdims=True)
        samples = (samples - mu) / sd

    # pad the window batch to a bucket size so the jitted kernels compile
    # once per bucket instead of once per case's window count
    samples_f32, n_real = _pad_batch(samples.astype(np.float32))
    peaks, n_peaks = find_rpeaks_batch(samples_f32, cfg.sampling_frequency)
    keep_padded = qc_mask(
        samples_f32, peaks, n_peaks, cfg.sampling_frequency, cfg.pvc_threshold, cfg.sd_threshold_ecg
    )
    peaks = np.asarray(peaks)[:n_real]
    n_peaks = np.asarray(n_peaks)[:n_real]
    keep = np.asarray(keep_padded)[:n_real]

    samples, peaks, n_peaks, indices = samples[keep], peaks[keep], n_peaks[keep], indices[keep]
    n_kept = len(samples)
    kept_f32, _ = _pad_batch(samples.astype(np.float32))
    peaks_p, _ = _pad_batch(peaks)
    n_peaks_p, _ = _pad_batch(n_peaks)
    medians = np.asarray(median_beat_batch(kept_f32, peaks_p, n_peaks_p))[:n_kept]

    if cfg.delineation_engine == "device" and n_kept:
        from ae_waveforms_tpu.signals.delineate_jax import delineate_batch
        from ae_waveforms_tpu.signals.features_jax import feature_rows_batch

        fiducials = delineate_batch(kept_f32, peaks_p, n_peaks_p, cfg.sampling_frequency)
        rows = np.asarray(
            feature_rows_batch(kept_f32, peaks_p, n_peaks_p, fiducials, cfg.sampling_frequency)
        )[:n_kept]
        valid = np.asarray(n_peaks) > 0
    else:
        peak_lists = [list(map(int, p[:k])) for p, k in zip(peaks, n_peaks)]
        # engine="python" must NOT silently upgrade to the native C++
        # delineator — it is the reference-equivalent oracle path
        native_ok = cfg.delineation_engine != "python"
        rows, valid = _feature_rows(
            samples, peak_lists, cfg,
            peaks_padded=peaks if native_ok else None,
            n_peaks=n_peaks if native_ok else None,
        )

    result = CaseResult(
        case_id=case_id,
        waves=medians[valid].astype(np.float32),
        features=rows[valid],
        indices=np.asarray(indices).reshape(-1)[valid],
        n_windows_raw=n_raw,
    )
    if cache_dir is not None:
        _save_case(cache_dir, case_id, result)
    return result


def _save_case(cache_dir: str, case_id: int, r: CaseResult) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(
        os.path.join(cache_dir, f"{case_id}.npz"),
        waves=r.waves,
        features=r.features,
        indices=r.indices,
        n_raw=r.n_windows_raw,
    )


def _prefetching_loader(record_loader: Callable, case_ids: Sequence[int], depth: int = 2):
    """Background-thread record prefetch: overlaps the (network/disk) record
    fetch with device compute — the TPU-era counterpart of the reference's
    ``mp.Pool`` preprocessing fan-out (data_extract_vitaldb.py:194-199,
    gated by cfg.parallel_preprocessing)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def worker():
        for cid in case_ids:
            q.put((cid, record_loader(cid)))
        q.put(None)

    threading.Thread(target=worker, daemon=True).start()
    cache = {}

    def fetch(cid):
        while cid not in cache:
            item = q.get()
            if item is None:
                return None
            cache[item[0]] = item[1]
        return cache.pop(cid)

    return fetch


def extract_cases(
    case_ids: Sequence[int],
    record_loader: Callable[[int], Optional[np.ndarray]],
    cfg: ExtractionConfig,
    cache_dir: Optional[str] = None,
    progress: bool = False,
    batched: bool = False,
    windows_per_batch: int = 512,
    mesh=None,
) -> List[CaseResult]:
    """Extract a set of cases.  ``record_loader`` abstracts VitalDB/network
    vs. synthetic/file-based sources (reference: load_record.py).

    ``batched=True`` pools windows across cases into large device batches
    (``windows_per_batch``) before the per-window kernels — amortising kernel
    launches over many cases, the right shape for co-located TPU hosts.

    ``mesh`` (device engine only) shards each window chunk's leading axis
    over the mesh's 'data' axis so one dispatch runs SPMD across all chips.

    ``cfg.parallel_preprocessing`` prefetches records on a background thread
    so I/O overlaps device compute.
    """
    if cfg.parallel_preprocessing:
        uncached = [
            cid for cid in case_ids
            if cache_dir is None or not os.path.exists(os.path.join(cache_dir, f"{cid}.npz"))
        ]
        record_loader = _prefetching_loader(record_loader, uncached)
    if batched:
        return extract_cases_batched(case_ids, record_loader, cfg, cache_dir, progress,
                                     windows_per_batch, mesh=mesh)
    results = []
    it = case_ids
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(case_ids)
        except ImportError:
            pass
    for cid in it:
        if cache_dir is not None and os.path.exists(os.path.join(cache_dir, f"{cid}.npz")):
            results.append(extract_case(cid, None, cfg, cache_dir))
            continue
        record = record_loader(cid)
        if record is None:
            continue
        results.append(extract_case(cid, record, cfg, cache_dir))
    return results


def _windows_of_case(cid: int, record: np.ndarray, cfg: ExtractionConfig, preprocessed: bool = False):
    rec = record if preprocessed else preprocess_record(record, cfg)
    samples, indices = segment_record(rec, cfg.sampling_frequency, cfg.sample_length)
    if len(samples):
        with np.errstate(all="ignore"):
            mu = np.nanmean(samples, axis=1, keepdims=True)
            sd = np.nanstd(samples, axis=1, keepdims=True)
            samples = (samples - mu) / sd
    return samples, indices.reshape(-1)


def preprocess_records_batched(records: List[np.ndarray], cfg: ExtractionConfig) -> List[np.ndarray]:
    """``preprocess_record`` over many records, filter backend per
    ``cfg.filter_backend`` (rationale + measurements: core/config.py).

    Trim + z-score stay on host (cheap numpy reductions).  The two
    zero-phase Butterworth passes then run either on host — the exact
    scipy filtfilt chain in float64 math on the float32 data, cast back
    (parity-oracle numerics, ~9.5 ms/record) — or through
    ``butterworth_batched``: segments pooled across ALL records, one
    device dispatch per length bucket.  float64 precision always takes
    the exact per-record scipy path."""
    if cfg.precision == "float64" or cfg.filter_backend == "host":
        # per-record scipy chain: preprocess_record already trims and runs
        # the exact f64 filtfilt pair for both of these cases — one copy of
        # the filter chain to keep in sync with cfg knobs
        return [preprocess_record(r, cfg) for r in records]
    trimmed = [_trim_zscore(r, np.float32) for r in records]
    return butterworth_batched(
        trimmed, cfg.butter_hp_ecg or None, cfg.butter_lp_ecg or None,
        cfg.sampling_frequency, cfg.butter_order,
    )


def extract_cases_batched(
    case_ids: Sequence[int],
    record_loader: Callable[[int], Optional[np.ndarray]],
    cfg: ExtractionConfig,
    cache_dir: Optional[str] = None,
    progress: bool = False,
    windows_per_batch: int = 512,
    mesh=None,
    inflight_depth: int = 2,
    max_inflight_depth: int = 8,
) -> List[CaseResult]:
    """Cross-case batched pipeline: host preprocessing/segmentation per
    record, then the per-window kernels (R peaks, QC, median beats,
    delineation+features) run over pooled window batches.

    The device engine runs as a streaming pipeline (see
    ``_extract_cases_batched_device``) and accepts a ``mesh`` for multi-chip
    SPMD dispatch plus an adaptive in-flight window (``inflight_depth`` is
    the floor, ``max_inflight_depth`` the cap — the queue deepens when
    per-dispatch latency spikes are detected, riding out tunnel congestion);
    host engines pool windows per accumulated case group (``mesh`` does
    not apply — their hot loop is the host delineator)."""
    if cfg.delineation_engine == "device":
        return _extract_cases_batched_device(
            case_ids, record_loader, cfg, cache_dir, progress, windows_per_batch,
            inflight_depth=inflight_depth, mesh=mesh,
            max_inflight_depth=max_inflight_depth,
        )
    if mesh is not None:
        raise ValueError(
            "mesh sharding applies to delineation_engine='device' only "
            f"(got engine={cfg.delineation_engine!r})"
        )
    results: List[CaseResult] = []
    pending: List[tuple] = []  # (cid, samples, indices)
    n_windows = 0

    def flush():
        nonlocal pending, n_windows
        if not pending:
            return
        all_samples = np.concatenate([s for _, s, _ in pending], axis=0)
        spans = np.cumsum([0] + [len(s) for _, s, _ in pending])

        samples_f32, n_real = _pad_batch(all_samples.astype(np.float32))
        peaks, n_peaks = find_rpeaks_batch(samples_f32, cfg.sampling_frequency)
        keep = qc_mask(
            samples_f32, peaks, n_peaks, cfg.sampling_frequency, cfg.pvc_threshold, cfg.sd_threshold_ecg
        )
        peaks = np.asarray(peaks)[:n_real]
        n_peaks = np.asarray(n_peaks)[:n_real]
        keep = np.asarray(keep)[:n_real]

        kept = all_samples[keep]
        kept_peaks, kept_n = peaks[keep], n_peaks[keep]
        kept_f32, n_kept = _pad_batch(kept.astype(np.float32))[0], len(kept)
        peaks_p, _ = _pad_batch(kept_peaks)
        n_peaks_p, _ = _pad_batch(kept_n)
        medians = np.asarray(median_beat_batch(kept_f32, peaks_p, n_peaks_p))[:n_kept]
        peak_lists = [list(map(int, p[:k])) for p, k in zip(kept_peaks, kept_n)]
        native_ok = cfg.delineation_engine != "python"
        rows, valid = _feature_rows(
            kept, peak_lists, cfg,
            peaks_padded=kept_peaks if native_ok else None,
            n_peaks=kept_n if native_ok else None,
        )

        # split back per case: kept-window index within each case span
        kept_case = np.repeat(np.arange(len(pending)), np.diff(spans))[keep]
        for ci, (cid, samples, indices) in enumerate(pending):
            sel = kept_case == ci
            v = valid[sel]
            res = CaseResult(
                case_id=cid,
                waves=medians[sel][v].astype(np.float32),
                features=rows[sel][v],
                indices=indices[keep[spans[ci] : spans[ci + 1]]][v],
                n_windows_raw=len(samples),
            )
            if cache_dir is not None:
                _save_case(cache_dir, cid, res)
            results.append(res)
        pending = []
        n_windows = 0

    it = case_ids
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(case_ids)
        except ImportError:
            pass

    # preprocessing batch: records pooled so the Butterworth passes run as
    # one device dispatch per segment-length bucket across many cases
    PREP_CHUNK = 32
    prep: List[tuple] = []  # (cid, raw record)

    def drain_prep():
        nonlocal prep, n_windows
        if not prep:
            return
        recs = preprocess_records_batched([r for _, r in prep], cfg)
        for (cid, _), rec in zip(prep, recs):
            samples, indices = _windows_of_case(cid, rec, cfg, preprocessed=True)
            if len(samples) == 0:
                res = CaseResult(cid, np.zeros((0, 320), np.float32), np.zeros((0, 35)), np.zeros((0,)), 0)
                if cache_dir is not None:
                    _save_case(cache_dir, cid, res)
                results.append(res)
                continue
            pending.append((cid, samples, indices))
            n_windows += len(samples)
            if n_windows >= windows_per_batch:
                flush()
        prep = []

    for cid in it:
        if cache_dir is not None and os.path.exists(os.path.join(cache_dir, f"{cid}.npz")):
            results.append(extract_case(cid, None, cfg, cache_dir))
            continue
        record = record_loader(cid)
        if record is None:
            continue
        prep.append((cid, record))
        if len(prep) >= PREP_CHUNK:
            drain_prep()
    drain_prep()
    flush()
    return results


def _extract_cases_batched_device(
    case_ids: Sequence[int],
    record_loader: Callable[[int], Optional[np.ndarray]],
    cfg: ExtractionConfig,
    cache_dir: Optional[str] = None,
    progress: bool = False,
    windows_per_batch: int = 512,
    inflight_depth: int = 2,
    mesh=None,
    max_inflight_depth: int = 8,
) -> List[CaseResult]:
    """Streaming device extraction: cases flow window-by-window through a
    single compiled (windows_per_batch, 10000) kernel with no per-group
    barrier.

    ``inflight_depth`` is the FLOOR of an adaptive controller:
    the tunnelled accelerator's per-dispatch round-trip time varies ~8x
    between congestion windows (BASELINE.md), and with a fixed shallow
    queue one slow round trip stalls dispatching.  Each result pull is
    timed; a pull slower than 3x the running median deepens the queue one
    level (more chunks overlap the straggler), 16 consecutive calm pulls
    decay it one level back toward the floor, and ``max_inflight_depth``
    caps it (each queued chunk pins ~20 MB of host memory for potential
    full-width re-dispatch).  Co-located hosts see stable pull times and
    stay at the floor.  Measured effect under replayed congestion traces:
    benchmarks/bench_congestion_replay.py.

    ``mesh``: an optional ``jax.sharding.Mesh`` — each chunk's window axis is
    sharded over the mesh's 'data' axis before dispatch, so ONE program runs
    SPMD across every chip (the kernel is row-independent: XLA partitions it
    with zero collectives).  This is the multi-chip scale-out of the
    reference's ``mp.Pool`` extraction fan-out
    (data_extract_vitaldb.py:194-199); requires
    ``windows_per_batch % mesh.shape['data'] == 0``.

    Three properties the per-group flush design lacked (measured 51.9 w/s
    end-to-end vs 216+ w/s for the kernel alone — round-2 VERDICT):

    - **full chunks only**: windows accumulate in a carry buffer and only
      exact ``windows_per_batch``-row chunks dispatch; the remainder rides
      into the next chunk instead of being zero-padded (the old design
      padded a ~11-row remainder to 512 on nearly every group — almost 2x
      wasted device compute).  Only the final end-of-run chunk pads.
    - **persistent in-flight queue**: up to ``inflight_depth + 1`` chunks
      stay un-pulled across the entire run, so host preprocessing,
      segmentation, and per-case unpacking all overlap device execution;
      results are pulled only when the queue is deep or the run ends.
    - **ONE program shape**: every dispatch is (windows_per_batch, 10000),
      so the run loads a single ~25 MB relay executable (see
      ``_window_batch_kernel_jit``).

    Results are returned in ``case_ids`` order regardless of completion
    order; per-case cache writes are unchanged.
    """
    from collections import deque

    from ae_waveforms_tpu.signals.rpeaks import LIGHT_CANDIDATES

    _check_resample(cfg)
    kernel = _window_batch_kernel_jit()
    W = windows_per_batch

    place = lambda chunk: chunk  # noqa: E731 — single-device: host array straight in
    if mesh is not None:
        import jax

        from ae_waveforms_tpu.parallel.mesh import batch_sharding

        n_data = mesh.shape["data"]
        if W % n_data != 0:
            raise ValueError(
                f"windows_per_batch={W} must divide evenly over the mesh's "
                f"data axis ({n_data} devices) for SPMD dispatch"
            )
        sharding = batch_sharding(mesh, ndim=2)
        place = lambda chunk: jax.device_put(chunk, sharding)  # noqa: E731

    seq_counter = iter(range(1 << 62))

    def run_chunk(chunk):
        """Dispatch one chunk through the light-profile program; returns the
        in-flight device value plus what a re-dispatch needs."""
        with _stage("dispatch"):
            slots = LIGHT_CANDIDATES if _host_max_locmax(chunk) <= LIGHT_CANDIDATES else None
            dev = kernel(place(chunk), cfg.sampling_frequency, cfg.pvc_threshold,
                         cfg.sd_threshold_ecg, candidate_slots=slots, k_width=K_LIGHT)
        return dev, chunk, slots, next(seq_counter), time.perf_counter()

    def resolve_chunk(dev, chunk, slots, k, seq, t_dispatch):
        """Pull a chunk result; re-dispatch full-width if any window's beat
        count overflowed K_LIGHT (rare: a window with HR > 144)."""
        if _RESOLVE_LATENCY_HOOK is not None:
            # congestion replay (bench/test only): the chunk's result
            # becomes "available" hook(seq) seconds after its dispatch —
            # a latency model of the recorded tunnel congestion windows
            wait = t_dispatch + _RESOLVE_LATENCY_HOOK(seq) - time.perf_counter()
            if wait > 0:
                time.sleep(wait)
        with _stage("pull"):
            arr = np.asarray(dev)
        if arr[:k, 357].max(initial=0.0) > K_LIGHT:
            arr = np.asarray(kernel(place(chunk), cfg.sampling_frequency, cfg.pvc_threshold,
                                    cfg.sd_threshold_ecg, candidate_slots=slots))
        return arr[:k, :357]
    by_cid = {}
    case_meta: "deque[tuple]" = deque()  # (cid, n_windows, indices) in window order
    buf: "deque[np.ndarray]" = deque()  # f32 window arrays awaiting dispatch
    buf_n = 0
    inflight: "deque[tuple]" = deque()  # (n_real_rows, device result)
    avail: "deque[np.ndarray]" = deque()  # pulled packed rows awaiting consumption
    avail_n = 0

    def _take(q: "deque[np.ndarray]", need: int) -> np.ndarray:
        """Pop exactly ``need`` rows off the front of a deque of arrays."""
        parts = []
        while need:
            a = q[0]
            if len(a) <= need:
                parts.append(a)
                need -= len(a)
                q.popleft()
            else:
                parts.append(a[:need])
                q[0] = a[need:]
                need = 0
        return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)

    def consume_cases() -> None:
        nonlocal avail_n
        while case_meta and case_meta[0][1] <= avail_n:
            cid, n, indices = case_meta.popleft()
            packed = _take(avail, n)
            avail_n -= n
            keep = packed[:, 0] > 0.5
            kp = packed[keep]
            valid = kp[:, 1] > 0.5
            res = CaseResult(
                case_id=cid,
                waves=kp[valid, 2:322].astype(np.float32),
                features=kp[valid, 322:357].astype(np.float64),
                indices=indices[keep][valid],
                n_windows_raw=n,
            )
            if cache_dir is not None:
                _save_case(cache_dir, cid, res)
            by_cid[cid] = res

    # adaptive in-flight depth controller (see the docstring): spike ->
    # deepen, 16 calm pulls -> decay one level toward the floor
    cur_depth = inflight_depth
    pull_times: "deque[float]" = deque(maxlen=33)
    calm_streak = 0

    def _observe_pull(dt: float) -> None:
        nonlocal cur_depth, calm_streak
        pull_times.append(dt)
        if len(pull_times) < 5:
            return
        med = sorted(pull_times)[len(pull_times) // 2]
        if dt > 3.0 * med:
            calm_streak = 0
            if cur_depth < max_inflight_depth:
                cur_depth += 1
        else:
            calm_streak += 1
            if calm_streak >= 16 and cur_depth > inflight_depth:
                cur_depth -= 1
                calm_streak = 0

    def pull(depth: int) -> None:
        nonlocal avail_n
        while len(inflight) > depth:
            k, dev, chunk, slots, seq, t_d = inflight.popleft()
            t0 = time.perf_counter()
            arr = resolve_chunk(dev, chunk, slots, k, seq, t_d)
            _observe_pull(time.perf_counter() - t0)
            avail.append(arr)
            avail_n += k
            consume_cases()

    def dispatch_ready() -> None:
        nonlocal buf_n
        while buf_n >= W:
            chunk = _take(buf, W)
            buf_n -= W
            dev, chunk, slots, seq, t_d = run_chunk(chunk)
            inflight.append((W, dev, chunk, slots, seq, t_d))
            pull(cur_depth)

    def dispatch_tail() -> None:
        nonlocal buf_n
        if buf_n:
            chunk = _take(buf, buf_n)
            k = len(chunk)
            chunk = np.concatenate([chunk, np.zeros((W - k, chunk.shape[1]), np.float32)])
            dev, chunk, slots, seq, t_d = run_chunk(chunk)
            inflight.append((k, dev, chunk, slots, seq, t_d))
            buf_n = 0

    it = case_ids
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(case_ids)
        except ImportError:
            pass

    # ------------------------------------------------------------------
    # Producer thread: record load -> filter -> segment -> window z-score,
    # all HOST work (with the default filter_backend="host" it never
    # touches the device), feeding a bounded queue the main thread drains
    # into the dispatch pipeline.  Single producer, single consumer — the
    # one-file-per-case cache invariant holds because cache reads AND
    # writes for a given cid happen on exactly one thread each, keyed by
    # disjoint cids.  Measured effect (BENCHMARKS.md Round 3): host prep
    # fully hides behind device window compute, so end-to-end tracks the
    # fused-kernel rate instead of summing with it.
    # ------------------------------------------------------------------
    import queue as _queue
    import threading

    PREP_CHUNK = 32
    q: "_queue.Queue[tuple]" = _queue.Queue(maxsize=64)
    stop = threading.Event()  # set when the consumer bails out — a dispatch
    # error mid-stream must not leave the producer blocked in q.put forever

    class _Abort(Exception):
        pass

    def _put(item: tuple) -> None:
        """q.put that aborts (instead of blocking) once the consumer died."""
        while True:
            if stop.is_set():
                raise _Abort
            try:
                q.put(item, timeout=0.2)
                return
            except _queue.Full:
                continue

    def producer() -> None:
        prep: List[tuple] = []  # (cid, raw record)

        def drain_prep() -> None:
            if not prep:
                return
            with _stage("filter"):
                recs = preprocess_records_batched([r for _, r in prep], cfg)
            for (cid, _), rec in zip(prep, recs):
                with _stage("segment"):
                    samples, indices = _windows_of_case(cid, rec, cfg, preprocessed=True)
                if len(samples) == 0:
                    res = CaseResult(cid, np.zeros((0, 320), np.float32), np.zeros((0, 35)), np.zeros((0,)), 0)
                    if cache_dir is not None:
                        _save_case(cache_dir, cid, res)
                    _put(("ready", cid, res))
                    continue
                _put(("case", cid, np.ascontiguousarray(samples, np.float32), indices))
            prep.clear()

        try:
            for cid in it:
                if cache_dir is not None and os.path.exists(os.path.join(cache_dir, f"{cid}.npz")):
                    _put(("ready", cid, extract_case(cid, None, cfg, cache_dir)))
                    continue
                record = record_loader(cid)
                if record is None:
                    continue
                prep.append((cid, record))
                if len(prep) >= PREP_CHUNK:
                    drain_prep()
            drain_prep()
        except _Abort:
            pass  # consumer already failed; its exception is the real one
        except BaseException as e:  # re-raised on the consumer side
            try:
                _put(("error", e))
            except _Abort:
                pass
        else:
            try:
                _put(("end",))
            except _Abort:
                pass

    t = threading.Thread(target=producer, name="extract-prep", daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item[0] == "end":
                break
            if item[0] == "error":
                raise item[1]
            if item[0] == "ready":
                by_cid[item[1]] = item[2]
                continue
            _, cid, samples, indices = item
            case_meta.append((cid, len(samples), indices))
            buf.append(samples)
            buf_n += len(samples)
            dispatch_ready()
        dispatch_tail()
        pull(0)
    finally:
        stop.set()  # unblocks a producer waiting on a full queue
        t.join(timeout=60.0)
    return [by_cid[cid] for cid in case_ids if cid in by_cid]
