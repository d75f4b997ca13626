"""At-scale device extraction: ~25k windows end-to-end (synthesis ->
pooled filtering -> segmentation -> fused window kernel), one process,
wall-clock inclusive of everything after record synthesis.

``--windows_per_batch`` and ``--inflight_depth`` exist to probe
relay-congestion tolerance: a bigger chunk amortises the per-dispatch
round trip over more device compute, and a deeper in-flight queue rides
out per-dispatch latency spikes — both matter exactly when the tunnel
inflates per-dispatch latency (the documented ~8x congestion windows)."""
import argparse, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.data.extract import extract_cases_batched
from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record

p = argparse.ArgumentParser()
p.add_argument("--n_cases", type=int, default=2300)  # ~11 windows/220 s record -> ~25k
p.add_argument("--windows_per_batch", type=int, default=512)
p.add_argument("--inflight_depth", type=int, default=2)
args = p.parse_args()

cfg = ExtractionConfig(delineation_engine="device")
t0 = time.perf_counter()
records = {c: synthetic_ecg_record(duration_s=220.0, seed=c) for c in range(args.n_cases)}
t1 = time.perf_counter()
print(f"synth {args.n_cases} records: {t1-t0:.0f}s", flush=True)
res = extract_cases_batched(
    list(records), lambda c: records[c], cfg, cache_dir=None,
    windows_per_batch=args.windows_per_batch, inflight_depth=args.inflight_depth,
)
t2 = time.perf_counter()
n_raw = sum(r.n_windows_raw for r in res)
n_kept = sum(len(r.waves) for r in res)
print(f"AT_SCALE_EXTRACT windows_raw={n_raw} kept={n_kept} wall_s={t2-t1:.0f} "
      f"rate={n_raw/(t2-t1):.1f} windows/s B={args.windows_per_batch} "
      f"depth={args.inflight_depth}", flush=True)
