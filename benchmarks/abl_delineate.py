import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
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

def _sync(out):
    for l in jax.tree_util.tree_leaves(out):
        np.asarray(l)

def timeit(name, f):
    out = f(); _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f()
    _sync(out)
    print(f"{name:16s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)

fs = D.ANALYSIS_RATE

def stage(sample, pk, npk, what):
    ecg = D._resample4(sample.astype(jnp.float32))
    dwt = D._dwt_scales(ecg, 9)
    if what == "dwt":
        return dwt[5], dwt[6]
    deg = 3
    K = pk.shape[0]
    beat_valid = (jnp.arange(K) < npk) & (pk >= 0)
    rp = jnp.where(beat_valid, pk * 4, 0).astype(jnp.int32)
    srch_bndry = 130
    t_dur = 1000
    p_back = 800
    def per_beat(r):
        tpk = D._tp_peak_one(ecg, dwt[6], r + srch_bndry, t_dur - srch_bndry, 0.25, 0.25 - 0.065, False, fs)
        p_start = r - p_back
        ppk_raw = D._tp_peak_one(ecg, dwt[5], p_start, (r - srch_bndry) - p_start, 0.02, 0.2, True, fs)
        return tpk, jnp.where(p_start < 0, jnp.nan, ppk_raw)
    tpeaks, ppeaks = jax.vmap(per_beat)(rp)
    if what == "tp":
        return tpeaks, ppeaks
    r_on, r_off = jax.vmap(lambda r, pp, tp: (
        jnp.where(jnp.isnan(pp), jnp.nan, D._bounded_onset(dwt[5], jnp.nan_to_num(pp).astype(jnp.int32), r, 0.5)),
        jnp.where(jnp.isnan(tp), jnp.nan, D._bounded_offset(dwt[5], r, jnp.nan_to_num(tp).astype(jnp.int32), 0.5)),
    ))(rp, ppeaks, tpeaks)
    if what == "qrsb":
        return r_on, r_off
    def tp_bounds(pk2, dur_on, dur_off, w_on, w_off):
        pki = jnp.nan_to_num(pk2).astype(jnp.int32)
        on = jnp.where(jnp.isnan(pk2), jnp.nan, D._onset_one(dwt[5], pki, dur_on, w_on, False))
        off = jnp.where(jnp.isnan(pk2), jnp.nan, D._offset_one(dwt[5], pki, dur_off, w_off, True))
        return on, off
    p_on, p_off = jax.vmap(lambda p2: tp_bounds(p2, 600, 600, 0.4, 0.4))(ppeaks)
    t_on, t_off = jax.vmap(lambda p2: tp_bounds(p2, 1200, 600, 0.6, 0.4))(tpeaks)
    return p_on, p_off, t_on, t_off

for what in ["dwt", "tp", "qrsb", "onoff"]:
    f = jax.jit(jax.vmap(lambda s, p, n, w=what: stage(s, p, n, w)))
    timeit(what, lambda f=f: f(samples, peaks, n_peaks))
timeit("full", lambda: D.delineate_batch(samples, peaks, n_peaks, 500))
