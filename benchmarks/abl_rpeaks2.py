import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
import ae_waveforms_tpu.signals.rpeaks as R

B, T = 256, 10000
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
MAX_SEGMENTS = R.MAX_SEGMENTS
sampling_rate = 500
levels = int(np.ceil(np.log2(T))) + 1

def core(signal, stage):
    xx = signal.astype(jnp.float32)
    absgrad = jnp.abs(R._gradient(xx))
    smoothgrad = R._boxcar_smooth(absgrad, 50)
    avggrad = R._boxcar_smooth(smoothgrad, 375)
    qrs = smoothgrad > 1.5 * avggrad
    rise = (~qrs[:-1]) & qrs[1:]
    fall = qrs[:-1] & (~qrs[1:])
    idxs = jnp.arange(T - 1)
    def compact(mask, fill):
        rank = jnp.cumsum(mask) - 1
        out = jnp.full((MAX_SEGMENTS,), fill, jnp.int32)
        out = out.at[jnp.where(mask, rank, MAX_SEGMENTS)].set(idxs, mode="drop")
        return out, jnp.sum(mask)
    beg_qrs, n_beg = compact(rise, T)
    end_qrs_all, _ = compact(fall, T)
    first_beg = beg_qrs[0]
    end_valid = (end_qrs_all > first_beg) & (end_qrs_all < T)
    end_rank = jnp.cumsum(end_valid) - 1
    end_qrs = jnp.full((MAX_SEGMENTS,), T, jnp.int32)
    end_qrs = end_qrs.at[jnp.where(end_valid, end_rank, MAX_SEGMENTS)].set(end_qrs_all, mode="drop")
    n_end = jnp.sum(end_valid)
    num_qrs = jnp.minimum(n_beg, n_end)
    seg_ids = jnp.arange(MAX_SEGMENTS)
    seg_valid = seg_ids < num_qrs
    seg_len = jnp.where(seg_valid, end_qrs - beg_qrs, 0)
    min_len = jnp.sum(seg_len) / jnp.maximum(num_qrs, 1) * 0.4
    is_locmax = jnp.zeros((T,), bool)
    is_locmax = is_locmax.at[1:-1].set((xx[1:-1] > xx[:-2]) & (xx[1:-1] > xx[2:]))
    pos = jnp.arange(T)
    seg_of = jnp.searchsorted(jnp.where(seg_valid, beg_qrs, T).astype(jnp.int32), pos, side="right") - 1
    seg_of = jnp.clip(seg_of, 0, MAX_SEGMENTS - 1)
    in_seg = (pos >= beg_qrs[seg_of]) & (pos < end_qrs[seg_of]) & seg_valid[seg_of]
    cand = is_locmax & in_seg & (pos > beg_qrs[seg_of]) & (pos < end_qrs[seg_of] - 1)
    if stage == "seg_of":
        return cand
    maxt, mint = R._sparse_tables(xx, levels)
    lo_b = beg_qrs[seg_of]
    hi_b = end_qrs[seg_of] - 1
    lstop = R._nearest_higher(xx, maxt, pos, xx, lo_b, hi_b, levels, left=True)
    rstop = R._nearest_higher(xx, maxt, pos, xx, lo_b, hi_b, levels, left=False)
    lmin = R._range_query(mint, jnp.clip(jnp.maximum(lstop, lo_b), 0, T - 1), pos, False)
    rmin = R._range_query(mint, pos, jnp.clip(jnp.minimum(rstop, hi_b), 0, T - 1), False)
    prominence = xx - jnp.maximum(lmin, rmin)
    prominence = jnp.where(cand, prominence, -jnp.inf)
    if stage == "prominence":
        return prominence
    seg_best = jnp.full((MAX_SEGMENTS,), -jnp.inf)
    seg_best = seg_best.at[jnp.where(cand, seg_of, MAX_SEGMENTS)].max(prominence, mode="drop")
    if stage == "seg_best":
        return seg_best
    is_best = cand & (prominence == seg_best[seg_of])
    seg_peak = jnp.full((MAX_SEGMENTS,), T, jnp.int32)
    seg_peak = seg_peak.at[jnp.where(is_best, seg_of, MAX_SEGMENTS)].min(pos, mode="drop")
    seg_has_peak = seg_valid & (seg_len >= min_len) & (seg_peak < T)
    if stage == "seg_peak":
        return seg_peak
    def accept(carry, inp):
        last, = carry
        peak, has = inp
        take = has & (peak - last > 150)
        new_last = jnp.where(take, peak, last)
        return (new_last,), jnp.where(take, peak, -1)
    (_,), accepted = jax.lax.scan(accept, (jnp.int32(0),), (seg_peak, seg_has_peak))
    if stage == "scan":
        return accepted
    acc_mask = accepted >= 0
    rank = jnp.cumsum(acc_mask) - 1
    peaks = jnp.full((128,), -1, jnp.int32)
    peaks = peaks.at[jnp.where(acc_mask, rank, 128)].set(accepted, mode="drop")
    return peaks

def _sync(out):
    # np.asarray transfer is the only reliable sync through the relay
    leaves = jax.tree_util.tree_leaves(out)
    for l in leaves:
        np.asarray(l)

def timeit(name, f):
    out = f(); _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f()
    _sync(out)
    print(f"{name:14s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)

for st in ["seg_of", "prominence", "seg_best", "seg_peak", "scan", "full"]:
    f = jax.jit(jax.vmap(lambda s, st=st: core(s, st)))
    timeit(st, lambda f=f: f(x))
