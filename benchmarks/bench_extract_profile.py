"""Stage timing for batched extraction: host prep vs device kernel."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.data.extract import _pad_batch, _window_batch_kernel_jit, _windows_of_case
from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record

cfg = ExtractionConfig(delineation_engine="device")
t0 = time.perf_counter()
records = [synthetic_ecg_record(duration_s=220.0, seed=1000 + c) for c in range(16)]
t1 = time.perf_counter()
print(f"synth 16 records: {t1-t0:.1f}s", flush=True)
all_s = []
for cid, rec in enumerate(records):
    s, _ = _windows_of_case(cid, rec, cfg)
    all_s.append(s)
t2 = time.perf_counter()
print(f"host prep (filter+segment) 16 cases: {t2-t1:.1f}s -> {sum(len(s) for s in all_s)} windows", flush=True)
samples = np.concatenate(all_s)[:176]
samples_f32, n_real = _pad_batch(samples.astype(np.float32))
print("padded shape", samples_f32.shape, flush=True)
kernel = _window_batch_kernel_jit()
t3 = time.perf_counter()
out = np.asarray(kernel(samples_f32, cfg.sampling_frequency, cfg.pvc_threshold, cfg.sd_threshold_ecg))
t4 = time.perf_counter()
print(f"kernel call 1 (incl compile/cache-load): {t4-t3:.1f}s", flush=True)
out = np.asarray(kernel(samples_f32, cfg.sampling_frequency, cfg.pvc_threshold, cfg.sd_threshold_ecg))
t5 = time.perf_counter()
print(f"kernel call 2 (warm): {t5-t4:.1f}s  -> {samples_f32.shape[0]/(t5-t4):.1f} windows/s", flush=True)
