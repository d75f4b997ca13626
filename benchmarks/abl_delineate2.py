"""Clean apportionment of delineate_batch cost: cumulative stages, scalar
checksum outputs so transfers don't pollute timings."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.data.extract import _windows_of_case, preprocess_records_batched
from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record
from ae_waveforms_tpu.signals.rpeaks import find_rpeaks_batch
import ae_waveforms_tpu.signals.delineate_jax as D

B = 256
cfg = ExtractionConfig(delineation_engine="device")
records = [synthetic_ecg_record(duration_s=220.0, seed=1000 + c) for c in range(26)]
pre = preprocess_records_batched(records, cfg)
smp = np.concatenate([_windows_of_case(i, r, cfg, preprocessed=True)[0] for i, r in enumerate(pre)])[:B]
samples = jnp.asarray(smp.astype(np.float32))
peaks, n_peaks = find_rpeaks_batch(samples, 500)

def timeit(name, f):
    out = f(); np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f()
    np.asarray(out)
    print(f"{name:10s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)

fs = D.ANALYSIS_RATE

def upto(sample, pk, npk, stage):
    ecg = D._resample4(sample.astype(jnp.float32))
    deg = 3
    dwt = D._dwt_scales(ecg, 9, needed=(5, 6))
    if stage == "dwt":
        return jnp.sum(dwt[5]) + jnp.sum(dwt[6])
    K = pk.shape[0]
    beat_valid = (jnp.arange(K) < npk) & (pk >= 0)
    rp = jnp.where(beat_valid, pk * 4, 0).astype(jnp.int32)
    srch_bndry, t_dur, p_back = 130, 1000, 800
    lane = 128
    r128 = lambda n: ((n + lane - 1) // lane) * lane
    W_T, W_P = r128(t_dur - srch_bndry), r128(p_back - srch_bndry)
    W_RON, W_ROFF = r128(p_back), r128(t_dur)
    W_ONOFF, W_TON = r128(600), r128(1200)
    def per_beat(r):
        tpk = D._tp_peak_one(ecg, dwt[6], r + srch_bndry, t_dur - srch_bndry, 0.25, 0.185, False, fs, w=W_T)
        p_start = r - p_back
        ppk_raw = D._tp_peak_one(ecg, dwt[5], p_start, (r - srch_bndry) - p_start, 0.02, 0.2, True, fs, w=W_P)
        return tpk, jnp.where(p_start < 0, jnp.nan, ppk_raw)
    tpeaks, ppeaks = jax.vmap(per_beat)(rp)
    if stage == "tp":
        return jnp.nansum(tpeaks) + jnp.nansum(ppeaks)
    r_on, r_off = jax.vmap(lambda r, pp, tp: (
        jnp.where(jnp.isnan(pp), jnp.nan, D._bounded_onset(dwt[5], jnp.nan_to_num(pp).astype(jnp.int32), r, 0.5, w=W_RON)),
        jnp.where(jnp.isnan(tp), jnp.nan, D._bounded_offset(dwt[5], r, jnp.nan_to_num(tp).astype(jnp.int32), 0.5, w=W_ROFF)),
    ))(rp, ppeaks, tpeaks)
    if stage == "qrsb":
        return jnp.nansum(r_on) + jnp.nansum(r_off)
    def tp_bounds(pk2, dur_on, dur_off, w_on, w_off, cap_on, cap_off):
        pki = jnp.nan_to_num(pk2).astype(jnp.int32)
        on = jnp.where(jnp.isnan(pk2), jnp.nan, D._onset_one(dwt[5], pki, dur_on, w_on, False, w=cap_on))
        off = jnp.where(jnp.isnan(pk2), jnp.nan, D._offset_one(dwt[5], pki, dur_off, w_off, True, w=cap_off))
        return on, off
    p_on, p_off = jax.vmap(lambda p2: tp_bounds(p2, 600, 600, 0.4, 0.4, W_ONOFF, W_ONOFF))(ppeaks)
    t_on, t_off = jax.vmap(lambda p2: tp_bounds(p2, 1200, 600, 0.6, 0.4, W_TON, W_ONOFF))(tpeaks)
    if stage == "onoff":
        return jnp.nansum(p_on) + jnp.nansum(p_off) + jnp.nansum(t_on) + jnp.nansum(t_off)
    def qs(r, on, off):
        q = jnp.where(jnp.isnan(on) | (jnp.nan_to_num(on).astype(jnp.int32) >= r), jnp.nan,
                      D._argext_window(ecg, jnp.nan_to_num(on).astype(jnp.int32), r, mode_min=True, w=W_RON))
        s = jnp.where(jnp.isnan(off) | (r + 1 >= jnp.nan_to_num(off).astype(jnp.int32)), jnp.nan,
                      D._argext_window(ecg, r + 1, jnp.nan_to_num(off).astype(jnp.int32), mode_min=True, w=W_ROFF))
        return q, s
    q_pk, s_pk = jax.vmap(qs)(rp, r_on, r_off)
    return jnp.nansum(q_pk) + jnp.nansum(s_pk) + jnp.nansum(tpeaks)

for st in ["dwt", "tp", "qrsb", "onoff", "full"]:
    f = jax.jit(jax.vmap(lambda s, p, n, st=st: upto(s, p, n, st)))
    timeit(st, lambda f=f: jnp.sum(f(samples, peaks, n_peaks)))
