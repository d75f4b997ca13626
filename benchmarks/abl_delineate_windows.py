"""Isolate the window-extraction (vmapped dynamic_slice -> gather) share of
the delineator's cost: extract the same 14 per-beat windows the real
delineator takes, reduce them to a checksum, and compare with the full
delineate_batch time."""
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

def _sync(out):
    for l in jax.tree_util.tree_leaves(out):
        np.asarray(l)

def timeit(name, f):
    out = f(); _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f()
    _sync(out)
    print(f"{name:22s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)

def windows_only(sample, pk, npk):
    ecg = D._resample4(sample.astype(jnp.float32))
    dwt = D._dwt_scales(ecg, 9, needed=(5, 6))
    K = pk.shape[0]
    rp = jnp.where((jnp.arange(K) < npk) & (pk >= 0), pk * 4, 0).astype(jnp.int32)
    def per_beat(r):
        acc = 0.0
        # the same 14 windows the real searches take (starts approximated
        # by beat-relative offsets; gather volume identical)
        for sig, start, length, w in [
            (dwt[6], r + 130, 870, 896), (ecg, r + 130, 870, 896),
            (dwt[5], r - 800, 670, 768), (ecg, r - 800, 670, 768),
            (dwt[5], r - 700, 700, 896),            # r_on
            (dwt[5], r, 1000, 1024),                # r_off
            (dwt[5], r - 600, 600, 640), (dwt[5], r - 300, 600, 640),  # p_on/off
            (dwt[5], r - 1000, 1200, 1280), (dwt[5], r + 300, 600, 640),  # t_on/off
            (ecg, r - 600, 600, 896), (ecg, r + 1, 900, 1024),  # q/s argext
        ]:
            d, v = D._window(sig, start, length, w)
            acc = acc + jnp.sum(d) + jnp.sum(v)
        return acc
    return jax.vmap(per_beat)(rp)

timeit("windows-only", lambda f=jax.jit(jax.vmap(windows_only)): f(samples, peaks, n_peaks))
timeit("full delineate", lambda: D.delineate_batch(samples, peaks, n_peaks, 500))
