"""Stage timing for batched extraction: synth / batched filter / segment /
window kernel, on the real chip."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.data.extract import (
    _pad_batch, _window_batch_kernel_jit, _windows_of_case, preprocess_records_batched,
)
from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record

cfg = ExtractionConfig(delineation_engine="device")
N = 32
t0 = time.perf_counter()
records = [synthetic_ecg_record(duration_s=220.0, seed=1000 + c) for c in range(N)]
t1 = time.perf_counter()
print(f"synth {N} records: {t1-t0:.1f}s", flush=True)
pre = preprocess_records_batched(records, cfg)   # cold-ish (cache may be warm)
t2 = time.perf_counter()
print(f"batched filter call 1: {t2-t1:.1f}s", flush=True)
pre = preprocess_records_batched(records, cfg)
t3 = time.perf_counter()
print(f"batched filter call 2 (warm): {t3-t2:.1f}s  ({(t3-t2)/N*1e3:.0f} ms/record)", flush=True)
all_s = []
for cid, rec in enumerate(pre):
    s, _ = _windows_of_case(cid, rec, cfg, preprocessed=True)
    all_s.append(s)
t4 = time.perf_counter()
nwin = sum(len(s) for s in all_s)
print(f"segment+window-zscore (host): {t4-t3:.1f}s -> {nwin} windows", flush=True)
from ae_waveforms_tpu.data.extract import K_LIGHT, _host_max_locmax
from ae_waveforms_tpu.signals.rpeaks import LIGHT_CANDIDATES

samples = np.concatenate(all_s)
samples_f32, n_real = _pad_batch(samples.astype(np.float32))
kernel = _window_batch_kernel_jit()
slots = LIGHT_CANDIDATES if _host_max_locmax(samples_f32) <= LIGHT_CANDIDATES else None
kw = dict(candidate_slots=slots, k_width=K_LIGHT)
out = np.asarray(kernel(samples_f32, cfg.sampling_frequency, cfg.pvc_threshold, cfg.sd_threshold_ecg, **kw))
t5 = time.perf_counter()
print(f"window kernel call 1 {samples_f32.shape}: {t5-t4:.1f}s", flush=True)
out = np.asarray(kernel(samples_f32, cfg.sampling_frequency, cfg.pvc_threshold, cfg.sd_threshold_ecg, **kw))
t6 = time.perf_counter()
print(f"window kernel call 2 (warm): {t6-t5:.1f}s -> {samples_f32.shape[0]/(t6-t5):.1f} windows/s", flush=True)
print(f"steady-state total ~ {(t3-t2)+(t4-t3)+(t6-t5):.1f}s for {N} cases / {nwin} windows", flush=True)
