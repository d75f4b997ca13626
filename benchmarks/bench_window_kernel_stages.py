"""Per-stage timing of the fused window kernel on a (B, 10000) batch."""
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
from ae_waveforms_tpu.signals.qc import qc_mask
from ae_waveforms_tpu.signals.median_beat import median_beat_batch
from ae_waveforms_tpu.signals.delineate_jax import delineate_batch
from ae_waveforms_tpu.signals.features_jax import feature_rows_batch

B = 256
cfg = ExtractionConfig(delineation_engine="device")
records = [synthetic_ecg_record(duration_s=220.0, seed=1000 + c) for c in range(26)]
pre = preprocess_records_batched(records, cfg)
smp = np.concatenate([_windows_of_case(i, r, cfg, preprocessed=True)[0] for i, r in enumerate(pre)])[:B]
samples = jnp.asarray(smp.astype(np.float32))
print("batch", samples.shape, flush=True)

fs = cfg.sampling_frequency
rp = jax.jit(functools.partial(find_rpeaks_batch, sampling_rate=fs))
peaks, n_peaks = rp(samples)
peaks.block_until_ready()
print("peaks shape", peaks.shape, flush=True)

stages = {
    "rpeaks": lambda: rp(samples)[0],
    "qc": None, "median": None, "delineate": None, "features": None,
}
qcj = jax.jit(lambda s, p, n: qc_mask(s, p, n, fs, cfg.pvc_threshold, cfg.sd_threshold_ecg))
medj = jax.jit(median_beat_batch)
delj = jax.jit(functools.partial(delineate_batch, fs_in=int(fs)))
fid = delj(samples, peaks, n_peaks)
featj = jax.jit(functools.partial(feature_rows_batch, fs=int(fs)))

def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    for l in leaves:
        np.asarray(l)

def timeit(name, f):
    out = f(); _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f()
    _sync(out)
    print(f"{name:10s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)

timeit("rpeaks", lambda: rp(samples))
timeit("qc", lambda: qcj(samples, peaks, n_peaks))
timeit("median", lambda: medj(samples, peaks, n_peaks))
timeit("delineate", lambda: delj(samples, peaks, n_peaks))
timeit("features", lambda: featj(samples, peaks, n_peaks, fid))
